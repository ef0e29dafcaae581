"""adlspark — a PySpark-native analytics engine with the capabilities of
aws-samples/accelerated-data-lake, extended with large-scale
training-data-pipeline operators (dedup, similarity, text analysis).

Design (SURVEY.md §7): declarative DataFrame/SQL plans, Catalyst does the
optimization; custom algorithms (as-of join, MinHash LSH, kNN) are expressed
as DataFrame programs, never as driver-side loops.
"""

__version__ = "0.1.0"
