"""Scalar function surface (SURVEY §2.9) + text analysis (§2.14)."""

from gather_datawarehouse_sync_spark.functions.scalar import (  # noqa: F401
    basename,
    strip_extension,
    strip_prefix,
    has_suffix,
)
from gather_datawarehouse_sync_spark.functions.text import (  # noqa: F401
    token_count,
    quality_score,
    language_guess,
    fingerprint,
)
from gather_datawarehouse_sync_spark.functions.classify import (  # noqa: F401
    classify_documents,
    classifier_score_milli,
    classifier_score_join,
)
