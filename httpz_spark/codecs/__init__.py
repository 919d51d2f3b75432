"""httpz_spark.codecs"""
