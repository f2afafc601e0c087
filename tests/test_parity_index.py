"""The parity index (scripts/parity_index.py → PARITY_INDEX.md) stays
complete and resolvable: every top-level reference symbol is mapped, every
named repo target imports, and the committed file matches a regeneration."""

import pathlib
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))

import parity_index  # noqa: E402


def test_index_complete_and_resolvable():
    if not parity_index.REF.exists():
        pytest.skip("/root/reference not present")
    errors = parity_index.check()
    assert not errors, "\n".join(errors)


def test_committed_file_is_current():
    committed = (ROOT / "PARITY_INDEX.md").read_text()
    assert committed == parity_index.generate(), (
        "PARITY_INDEX.md is stale — re-run scripts/parity_index.py"
    )
