"""frizbee_spark — a PySpark-native near-duplicate detection + fuzzy matching
engine whose candidate-pair verification kernel reproduces frizbee's
Smith-Waterman scoring byte-for-byte (reference: saghen/frizbee)."""

__version__ = "0.1.0"
