"""httpz_spark.functions"""
