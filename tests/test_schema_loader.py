"""Schema-spec resolution parity with the reference's producer-side loader
(``/root/reference/fluvii/components/producer/producer.py:95-134``): dict
passthrough, ``.avro``/``.avsc``/``.json`` file paths (absolute and
library-root-relative), importable ``pkg.attr`` strings against a
filesystem-rooted schema library, and inline JSON."""

import json
import textwrap

import pytest

from fluvii_spark.serde.schema_loader import load_schema

RECORD = {
    "type": "record",
    "name": "Acct",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "balance", "type": ["null", "double"], "default": None},
    ],
}


def test_dict_and_list_pass_through():
    assert load_schema(RECORD) is RECORD
    union = ["null", "string"]
    assert load_schema(union) is union


def test_inline_json_string():
    assert load_schema(json.dumps(RECORD)) == RECORD
    assert load_schema('"string"') == "string"


@pytest.mark.parametrize("suffix", [".avro", ".avsc", ".json"])
def test_file_path_absolute(tmp_path, suffix):
    p = tmp_path / f"acct{suffix}"
    p.write_text(json.dumps(RECORD))
    assert load_schema(str(p)) == RECORD


def test_file_path_relative_to_library_root(tmp_path):
    (tmp_path / "nested").mkdir()
    p = tmp_path / "nested" / "acct.avro"
    p.write_text(json.dumps(RECORD))
    assert load_schema("nested/acct.avro", str(tmp_path)) == RECORD


def _make_library(tmp_path):
    lib = tmp_path / "acctlib"
    lib.mkdir()
    (lib / "__init__.py").write_text("")
    (lib / "schemas.py").write_text(
        textwrap.dedent(
            f"""
            ACCOUNT = {RECORD!r}
            """
        )
    )
    return lib


def test_package_attr_with_library_root(tmp_path):
    lib = _make_library(tmp_path)
    assert load_schema("acctlib.schemas.ACCOUNT", str(lib)) == RECORD


def test_package_attr_library_root_init_path(tmp_path):
    # the reference accepts the root given as .../__init__.py too
    lib = _make_library(tmp_path)
    assert (
        load_schema("acctlib.schemas.ACCOUNT", str(lib / "__init__.py"))
        == RECORD
    )


def test_unresolvable_spec_reports_attempts(tmp_path):
    with pytest.raises(ValueError, match="tried"):
        load_schema("no/such/file.avro")
    with pytest.raises(ValueError, match="tried"):
        load_schema("not json and not dotted-with-suffix!")


def test_codec_roundtrip_from_file_spec(tmp_path):
    from fluvii_spark.serde.avro_codec import AvroCodec

    p = tmp_path / "acct.avsc"
    p.write_text(json.dumps(RECORD))
    codec = AvroCodec(load_schema(str(p)))
    value = {"id": "a-1", "balance": 12.5}
    assert codec.decode(codec.encode(value)) == value
