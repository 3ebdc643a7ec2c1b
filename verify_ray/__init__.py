"""verify_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch reimplementation of the capabilities of `tamasfe/verify`
(a Rust serde-visitor JSON Schema validator, /root/reference) as a
distributed, columnar, streaming validation engine over Parquet tables
of pre-tokenized training sequences:

    spec = ConstraintSpec.from_yaml("specs/sequences.yaml")
    plan = spec.compile()                    # fail fast on a bad spec
    report = validate(ds, plan)              # ds: ray.data.Dataset
    report.violations                        # Dataset of (doc_id, rule_id, span, message)
    report.verdicts                          # per-partition pass/fail

Design: SURVEY.md.  No code is ported from the reference; semantics are
mirrored from its observable behavior (cited per-kernel).
"""

from .errors import R, SpecError, VIOLATION_SCHEMA, VERDICT_SCHEMA
from .spec import ColumnSpec, ConstraintSpec, DriftSpec
from .kernels import CompiledPlan


def verify_value(source, spec, **kwargs):
    """Reference-API-flavoured alias for :func:`verify_ray.engine.validate`
    (``Verifier::verify_value``, /root/reference/verify/src/lib.rs:191-206):
    validate one dataset against one spec, get the accumulated errors."""
    from .engine import validate

    return validate(source, spec, **kwargs)


__all__ = [
    "R",
    "SpecError",
    "VIOLATION_SCHEMA",
    "VERDICT_SCHEMA",
    "ColumnSpec",
    "ConstraintSpec",
    "DriftSpec",
    "CompiledPlan",
    "verify_value",
]

__version__ = "0.1.0"
