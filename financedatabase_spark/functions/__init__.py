from financedatabase_spark.functions import columns

__all__ = ["columns"]
