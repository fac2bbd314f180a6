"""Vector math as built-in Column expressions (no Python UDFs).

Replicates the numpy vector-store metrics
(/root/reference/memory_core/embeddings/vector_stores/numpy/numpy_store.py:586-626):
cosine with ε-guards, L2→similarity 1/(1+d), raw inner product.

``F.aggregate`` + ``F.zip_with`` compile to Catalyst higher-order
functions — evaluated JVM-side per row, no serialization boundary, and
they participate in whole-stage codegen. For 768-dim vectors this is the
right default; a Pandas-UDF matmul path only wins when one side is a
large constant matrix (see operators/similarity.py).

All expressions compute in DOUBLE regardless of input float width so
results match a float64 oracle bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-10  # numpy_store.py cosine ε-guard


def _d(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cosine with ε-guard (numpy_store.py:601-614): 0.0 when either
    vector has ~zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na < EPS) | (nb < EPS), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
                              F.lit(0.0), lambda acc, x: acc + x))


def l2_similarity(a: Column, b: Column) -> Column:
    """L2 → similarity 1/(1+d) (numpy_store.py:601-605)."""
    return F.lit(1.0) / (F.lit(1.0) + l2_distance(a, b))


def normalize(a: Column) -> Column:
    """Unit-normalize (zero vectors pass through unchanged)."""
    n = norm(a)
    return F.when(n < EPS, _d(a)).otherwise(F.transform(_d(a), lambda x: x / n))
