from sap_data_pipeline_spark.plans import catalog, star_mapping, store_rp, weekly_sales

__all__ = ["catalog", "star_mapping", "store_rp", "weekly_sales"]
