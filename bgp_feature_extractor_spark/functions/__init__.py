from bgp_feature_extractor_spark.functions.editdist import levenshtein_udf

__all__ = ["levenshtein_udf"]
