"""httpz_spark.sources"""
