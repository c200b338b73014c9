"""Pure-pandas reference oracle + deterministic fixture generators (no Spark).

The reference ships zero tests (SURVEY.md §5); its correctness artifact is
golden CSVs. This package replaces re-running the Python-2 original with a
Python-3-faithful reimplementation of its semantics (including the quirk
ledger Q1-Q9 from SURVEY.md §7.0), used as the allclose target for the
Spark engine.
"""

from bgp_feature_extractor_spark.oracle.fixtures import (
    make_anomaly_intervals,
    make_events_updates,
    make_rib_snapshot,
    make_sequences,
)
from bgp_feature_extractor_spark.oracle.reference_oracle import ReferenceOracle

__all__ = [
    "ReferenceOracle",
    "make_events_updates",
    "make_rib_snapshot",
    "make_sequences",
    "make_anomaly_intervals",
]
