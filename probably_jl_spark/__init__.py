"""probably_jl_spark — a PySpark-native distributed sketch / approximate-
aggregation library: mergeable HyperLogLog, count-min, Bloom, cuckoo,
t-digest and KLL states built inside vectorized Arrow UDFs over transcript
tables, merged treeReduce-style. See SURVEY.md for the blueprint."""

__version__ = "0.1.0"
