"""httpz_spark.parity"""
