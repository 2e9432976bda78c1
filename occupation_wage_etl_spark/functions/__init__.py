"""Scalar expression library (all JVM-side Column expressions).

Submodules:
- ``cleaning`` — the reference's cell/column cleaning grammar (SURVEY.md §2.3)
- ``text``     — tokenization, n-grams, quality metrics, language-ID, fingerprints
- ``similarity`` — vector math (cosine), portable hashing for MinHash
"""

from occupation_wage_etl_spark.functions import cleaning, similarity, text

__all__ = ["cleaning", "text", "similarity"]
