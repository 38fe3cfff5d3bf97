from img2dataset_spark.sources.reader import load

__all__ = ["load"]
