"""Column-expression libraries: text analysis + vector math.

Everything here returns Spark Column expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python
UDFs in the hot path.
"""
