from sap_data_pipeline_spark.functions import cleaning, text, vectors

__all__ = ["cleaning", "text", "vectors"]
