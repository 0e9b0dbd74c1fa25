"""Scalar vectorized Pandas UDFs over embedding columns.

NOTE: this module deliberately has NO ``from __future__ import annotations``
— pandas_udf infers the eval type from REAL type hints, and the future
import would stringify them (PySpark raises UNSUPPORTED_SIGNATURE on
string annotations).

Return types are DataType INSTANCES, not DDL strings: a module-level
``@pandas_udf("double")`` parses the string through the active session's
JVM in pyspark 4, so any fresh process importing this module before
creating a SparkSession crashes (r12 import-isolation gate finding).

These exist to exercise and gate the Arrow UDF lane; the same math is
expressible (and elsewhere computed) with built-in F.aggregate folds. Per
Arrow batch the work is one numpy/BLAS pass over a (batch, dim) matrix —
the "when you must leave the JVM, batch it" pattern.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def l2_norm(v: pd.Series) -> pd.Series:
    m = np.vstack(v.to_numpy()).astype(np.float64)
    return pd.Series(np.sqrt((m**2).sum(axis=1)))


@pandas_udf(DoubleType())
def mean_dim(v: pd.Series) -> pd.Series:
    m = np.vstack(v.to_numpy()).astype(np.float64)
    return pd.Series(m.mean(axis=1))
