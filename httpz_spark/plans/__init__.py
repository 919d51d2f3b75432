"""httpz_spark.plans"""
