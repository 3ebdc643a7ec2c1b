"""Error model: rule ids, messages, violation/verdict Arrow schemas.

Mirrors the reference error catalogue
(/root/reference/verify/src/impls/schemars/errors.rs:62-144 — the
``ErrorValue`` enum) re-expressed as *data*: a validation run emits
violation ROWS ``(doc_id, rule_id, span, message)`` instead of an
in-memory accumulator (``Errors`` + ``AddAssign``,
errors.rs:349-415).  Accumulation semantics are preserved: one value
breaking N rules yields N rows; violations never abort the run.

``span`` uses the reference's dotted-keys convention
(/root/reference/verify/src/span.rs:73-114): a column name for
row-level violations (``n_tok``), ``col.<i>`` for element-level ones
(``tokens.3``), and the empty string for whole-row violations —
matching ``() the required property "some_int" is missing`` in
/root/reference/verify/examples/schemars_json.rs:75.

Message texts follow the reference ``Display`` impls
(errors.rs:198-330) so golden tests read the same.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# rule ids — snake_case of the reference ErrorValue variants (errors.rs:62-144)
# plus the engine-level generalisations (SURVEY.md §2.6).


class R:
    """Rule-id constants. One per ErrorValue variant + engine extensions."""

    # reference variants
    NEVER = "never"                                # ErrorValue::Never
    UNKNOWN_PROPERTY = "unknown_property"          # ErrorValue::UnknownProperty
    INVALID_SCHEMA = "invalid_schema"              # ErrorValue::InvalidSchema
    UNSUPPORTED_VALUE = "unsupported_value"        # ErrorValue::UnsupportedValue
    INVALID_TYPE = "invalid_type"                  # ErrorValue::InvalidType
    INVALID_ENUM_VALUE = "invalid_enum_value"      # ErrorValue::InvalidEnumValue
    NOT_MULTIPLE_OF = "not_multiple_of"            # ErrorValue::NotMultipleOf
    LESS_THAN_EXPECTED = "less_than_expected"      # ErrorValue::LessThanExpected
    MORE_THAN_EXPECTED = "more_than_expected"      # ErrorValue::MoreThanExpected
    NO_PATTERN_MATCH = "no_pattern_match"          # ErrorValue::NoPatternMatch
    TOO_LONG = "too_long"                          # ErrorValue::TooLong
    TOO_SHORT = "too_short"                        # ErrorValue::TooShort
    NONE_VALID = "none_valid"                      # ErrorValue::NoneValid
    MORE_THAN_ONE_VALID = "more_than_one_valid"    # ErrorValue::MoreThanOneValid
    VALID_NOT = "valid_not"                        # ErrorValue::ValidNot
    NOT_UNIQUE = "not_unique"                      # ErrorValue::NotUnique
    MUST_CONTAIN = "must_contain"                  # ErrorValue::MustContain
    NOT_ENOUGH_ITEMS = "not_enough_items"          # ErrorValue::NotEnoughItems
    TOO_MANY_ITEMS = "too_many_items"              # ErrorValue::TooManyItems
    NOT_ENOUGH_PROPERTIES = "not_enough_properties"  # ErrorValue::NotEnoughProperties
    TOO_MANY_PROPERTIES = "too_many_properties"    # ErrorValue::TooManyProperties
    REQUIRED_PROPERTY = "required_property"        # ErrorValue::RequiredProperty
    CUSTOM = "custom"                              # ErrorValue::Custom

    # engine-level generalisations (table scope; SURVEY.md §2.6)
    NON_NULL = "non_null"                  # per-row null in a non-null column
    LEN_EQUALS_COLUMN = "len_equals_column"  # cross-field: n_tok == len(tokens)
    COLUMN_COMPARISON = "column_comparison"  # cross-field: value <op> other column
    ELEMENT_OUT_OF_BOUNDS = "element_out_of_bounds"  # list element outside bounds
    ELEMENT_INVALID_TYPE = "element_invalid_type"    # list element dtype mismatch
    REF_MISSING = "ref_missing"            # referential: key absent from manifest
    DRIFT = "drift"                        # distribution drift vs reference epoch
    UNKNOWN_COLUMN = "unknown_column"      # additionalProperties:false analogue


ALL_RULE_IDS = frozenset(
    v for k, v in vars(R).items() if not k.startswith("_") and isinstance(v, str)
)

# ---------------------------------------------------------------------------
# message builders — texts mirror errors.rs:198-330 Display impls.


def fmt_num(x: float) -> str:
    """Render a float the way Rust's {} does for f64 (1 -> "1", 1.5 -> "1.5")."""
    f = float(x)
    return str(int(f)) if f.is_integer() else repr(f)


def msg_never() -> str:
    return "no values allowed"


def msg_unknown_property() -> str:
    # the golden example prints "value is not allowed here" for remapped
    # UnknownProperty (examples/schemars_json.rs:74 comment); Display says
    # "unknown property".  We keep the Display text.
    return "unknown property"


def msg_invalid_type(expected: str, actual: str) -> str:
    return f'invalid type, expected "{expected}", not "{actual}"'


def msg_invalid_enum(expected: list) -> str:
    import json

    vals = ", ".join(json.dumps(v) for v in expected)
    return f"invalid enum value, expected to be one of {{{vals}}}"


def msg_not_multiple_of(m: float) -> str:
    return f"the value is expected to be multiple of {fmt_num(m)}"


def msg_less_than_expected(minimum: float, exclusive: bool) -> str:
    if exclusive:
        return f"the value is expected to be more than {fmt_num(minimum)}"
    return f"the value is expected to be at least {fmt_num(minimum)}"


def msg_more_than_expected(maximum: float, exclusive: bool) -> str:
    if exclusive:
        return f"the value is expected to be less than {fmt_num(maximum)}"
    return f"the value is expected to be at most {fmt_num(maximum)}"


def msg_no_pattern_match(pattern: str) -> str:
    return f'the string must match the pattern "{pattern}"'


def msg_too_long(max_length: int) -> str:
    return f"the string must not be longer than {max_length} characters"


def msg_too_short(min_length: int) -> str:
    # double "must must" is verbatim from the reference (errors.rs:267-271)
    return f"the string must must be at least {min_length} characters long"


def msg_none_valid(exclusive: bool) -> str:
    return "no subschema matched the value:"


def msg_more_than_one_valid(matched: int) -> str:
    return f"expected exactly one schema to match, but {matched} schemas matched"


def msg_valid_not(title: str | None = None) -> str:
    # titled sub-schema interpolation mirrors errors.rs:289-296
    if title:
        return f'the value must not be a "{title}"'
    return 'the value is disallowed by a "not" schema'


def msg_not_unique() -> str:
    return "all items in the array must be unique"


def msg_must_contain(title: str | None = None) -> str:
    # titled schema interpolation mirrors errors.rs:301-315
    if title:
        return f'at least one of the items in the array must be "{title}"'
    return "at least one of the items in the array must match the given schema"


def msg_not_enough_items(minimum: int) -> str:
    return f"the array must have at least {minimum} items"


def msg_too_many_items(maximum: int) -> str:
    return f"the array cannot have more than {maximum} items"


def msg_required_property(name: str) -> str:
    return f'the required property "{name}" is missing'


def msg_column_comparison(op_sym: str, other: str) -> str:
    return f'the value must be {op_sym} column "{other}"'


# ---------------------------------------------------------------------------
# output schemas

VIOLATION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("rule_id", pa.string()),
        ("span", pa.string()),
        # NotUnique{first, duplicate} span pair (errors.rs:119-122,
        # schema.rs:738-755): `span` is the duplicate occurrence,
        # `first_span` the first-seen one (element index for S3, input
        # partition for W1).  Null for every other rule.
        ("first_span", pa.string()),
        ("message", pa.string()),
        # anyOf/oneOf child-error payload (NoneValid{schemas, errors} /
        # MoreThanOneValid{matched}, errors.rs:106-113): JSON naming
        # each branch and its failing child rules.  Null elsewhere.
        ("detail", pa.string()),
        ("partition_id", pa.int32()),
    ]
)


def conform_violations(t: pa.Table) -> pa.Table:
    """Reorder ``t``'s columns to VIOLATION_SCHEMA, adding any missing
    ones (e.g. ``first_span``) as nulls — lets violation producers that
    have no span-pair information stay oblivious to the column."""
    cols = []
    for f in VIOLATION_SCHEMA:
        if f.name in t.column_names:
            cols.append(t.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.table(dict(zip(VIOLATION_SCHEMA.names, cols)))

VERDICT_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("n_rows", pa.int64()),
        ("n_violations", pa.int64()),
        # a partition passes iff it has zero violations — mirror of
        # Errors::is_empty (errors.rs:354-356)
        ("pass", pa.bool_()),
        ("rule_counts", pa.string()),  # JSON {rule_id: count}
    ]
)


class SpecError(ValueError):
    """Raised by ConstraintSpec.compile() with ALL spec problems listed —
    the analogue of RootSchema::verify (reference verify.rs:9-171): a spec
    must be valid before any data is read."""

    def __init__(self, problems: list[str]):
        self.problems = list(problems)
        super().__init__("invalid spec:\n" + "\n".join(f"  - {p}" for p in self.problems))
