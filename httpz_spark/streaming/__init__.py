"""httpz_spark.streaming"""
