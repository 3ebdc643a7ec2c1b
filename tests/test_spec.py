"""Spec loading + compilation tests — the analogue of the reference's
schema self-validation tests (/root/reference/verify/tests/schemars.rs:108-141:
bad regex, missing local $ref, external $ref)."""

import pytest

from verify_ray.errors import SpecError
from verify_ray.spec import ConstraintSpec
from verify_ray.sources.synth import default_spec_dict


def test_default_spec_compiles():
    spec = ConstraintSpec.from_dict(default_spec_dict())
    plan = spec.compile()
    assert plan.key == "doc_id"
    assert plan.unique_columns == ["doc_id"]
    assert [r.manifest for r in plan.ref_checks] == ["source_manifest"]
    rule_ids = {r.rule_id for r in plan.row_rules}
    assert {"non_null", "no_pattern_match", "too_long", "too_short",
            "less_than_expected", "more_than_expected", "invalid_enum_value",
            "len_equals_column"} <= rule_ids
    assert {r.rule_id for r in plan.element_rules} == {"element_out_of_bounds"}


def test_bad_regex_rejected():
    # verify.rs:151-164 analogue (InvalidSchema::InvalidPattern)
    d = default_spec_dict()
    d["columns"]["doc_id"]["pattern"] = "(unclosed"
    with pytest.raises(SpecError, match="invalid regex pattern"):
        ConstraintSpec.from_dict(d).compile()


def test_missing_definition_rejected():
    # verify.rs:51-72 analogue (InvalidSchema::MissingDefinition)
    d = default_spec_dict()
    d["columns"]["extra"] = {"$ref": "#/definitions/nope"}
    with pytest.raises(SpecError, match='missing local definition "nope"'):
        ConstraintSpec.from_dict(d)


def test_external_reference_rejected():
    # verify.rs:60-66 analogue (InvalidSchema::ExternalReference)
    d = default_spec_dict()
    d["columns"]["extra"] = {"$ref": "https://example.com/schema.json"}
    with pytest.raises(SpecError, match="unresolved external reference"):
        ConstraintSpec.from_dict(d)


def test_ref_resolution_inlines_definition():
    d = default_spec_dict()
    d["definitions"] = {"bounded": {"dtype": "int32", "minimum": 0}}
    d["columns"]["extra"] = {"$ref": "#/definitions/bounded", "maximum": 10}
    spec = ConstraintSpec.from_dict(d)
    extra = next(c for c in spec.columns if c.name == "extra")
    assert extra.dtype == "int32" and extra.minimum == 0 and extra.maximum == 10


def test_all_problems_accumulated():
    # like RootSchema::verify, ALL problems come back at once
    d = default_spec_dict()
    d["columns"]["doc_id"]["pattern"] = "(unclosed"
    d["columns"]["n_tok"]["minimum"] = 100
    d["columns"]["n_tok"]["maximum"] = 1
    d["columns"]["tokens"]["len_equals"] = "not_a_column"
    with pytest.raises(SpecError) as ei:
        ConstraintSpec.from_dict(d).compile()
    text = str(ei.value)
    assert "invalid regex" in text
    assert "lower bound" in text
    assert "not_a_column" in text


def test_key_must_be_declared():
    with pytest.raises(SpecError, match="key column"):
        ConstraintSpec.from_dict(
            {"key": "id", "columns": {"x": {"dtype": "int32"}}}
        ).compile()


def test_multiple_of_zero_rejected():
    d = default_spec_dict()
    d["columns"]["n_tok"]["multiple_of"] = 0
    with pytest.raises(SpecError, match="multiple_of"):
        ConstraintSpec.from_dict(d).compile()


def test_yaml_roundtrip(tmp_path):
    import yaml

    p = tmp_path / "spec.yaml"
    p.write_text(yaml.safe_dump(default_spec_dict()))
    spec = ConstraintSpec.from_yaml(str(p))
    assert spec.key == "doc_id"
    assert spec.spec_hash() == ConstraintSpec.from_dict(default_spec_dict()).spec_hash()


def test_bad_predicate_tree_rejected():
    d = default_spec_dict()
    d["columns"]["n_tok"]["checks"] = [{"then": {"minimum": 1}}]
    with pytest.raises(SpecError, match="without 'if'"):
        ConstraintSpec.from_dict(d).compile()


def test_spec_fixture_files():
    """The shipped spec fixtures: the real one compiles; the broken ones
    fail listing every problem (FIXTURES.md spec fixtures)."""
    spec = ConstraintSpec.from_yaml("specs/sequences.yaml")
    plan = spec.compile()
    assert plan.unique_columns == ["doc_id"]
    assert plan.drift is not None
    with pytest.raises(SpecError, match="invalid regex"):
        ConstraintSpec.from_yaml("specs/broken_regex.yaml").compile()
    with pytest.raises(SpecError) as ei:
        ConstraintSpec.from_yaml("specs/broken_ref.yaml").compile()
    assert "missing local definition" in str(ei.value)
    assert "external reference" in str(ei.value)


def test_nested_events_example_spec_compiles():
    from verify_ray.spec import ConstraintSpec

    plan = ConstraintSpec.from_yaml("specs/nested_events.yaml").compile()
    assert "meta.client.version" in [r.column for r in plan.row_rules]
    assert plan.struct_specs["meta"]["strict"]
    # tagged variant rules compiled and gated
    assert any(r.rule_id == "less_than_expected" and r.column == "value"
               for r in plan.row_rules)
