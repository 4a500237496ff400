"""Training-data-pipeline operators (the north-star extension surface in
BASELINE.json): deduplication, similarity search, text analysis,
multimodal column plumbing. All are DataFrame → DataFrame functions built
from built-in Spark expressions (JVM-side) wherever the semantics allow;
Python appears only in explicitly-marked Pandas-UDF paths.
"""
