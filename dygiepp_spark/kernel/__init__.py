"""dygiepp_spark — PySpark-native DyGIE++-style KG construction engine."""
