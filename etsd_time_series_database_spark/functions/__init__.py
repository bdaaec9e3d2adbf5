from etsd_time_series_database_spark.functions.exprs import (
    bucket_epoch,
    cosine_similarity,
    davg,
    dot_product,
    dsum,
    epoch_s,
    epoch_us,
    l2_norm,
    poly_fingerprint,
    round6,
)

__all__ = [
    "bucket_epoch",
    "cosine_similarity",
    "davg",
    "dot_product",
    "dsum",
    "epoch_s",
    "epoch_us",
    "l2_norm",
    "poly_fingerprint",
    "round6",
]
