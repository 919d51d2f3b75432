"""httpz_spark.operators"""
