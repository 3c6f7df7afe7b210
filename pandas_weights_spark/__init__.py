"""pandas-weights-spark: a PySpark-native weighted-analytics engine.

Re-expression of ``nachomaiz/pandas-weights`` (weighted
count/sum/mean/var/std/corr/apply + weighted groupby and time resample)
as lazy Spark DataFrame plans, plus the large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
the reference lacks.

Entry point::

    from pandas_weights_spark import wt
    wdf = wt(df, "weight_col")          # bind weights (no data copied)
    wdf.groupby("k").mean()              # one shuffle, one agg pass
    wdf.resample("2D", on="ts").var()    # tumbling-window weighted variance
    wdf.corr()                           # pairwise weighted Pearson (long form)
"""

from pandas_weights_spark.frame import (
    WeightedDataFrame,
    WeightedSeries,
    install_accessor,
    wt,
)
from pandas_weights_spark.groupby import WeightedGroupBy
from pandas_weights_spark.resample import WeightedResampler
from pandas_weights_spark.calibration import (
    rake_weights,
    weight_diagnostics,
)
from pandas_weights_spark.sample import (
    cap_per_group,
    hash_split,
    kfold_split,
    stratified_sample,
    weighted_sample,
)

__version__ = "0.1.0"

__all__ = [
    "wt",
    "install_accessor",
    "WeightedDataFrame",
    "WeightedSeries",
    "WeightedGroupBy",
    "WeightedResampler",
    "weighted_sample",
    "stratified_sample",
    "hash_split",
    "kfold_split",
    "cap_per_group",
    "rake_weights",
    "weight_diagnostics",
    "__version__",
]
