"""OPERATORS.md freshness gate (VERDICT r9 #8): the index is GENERATED
from the registry docstrings so it cannot drift — this test regenerates
and diffs, failing on any registration change that wasn't followed by
`python tools/gen_operators_md.py`."""

from __future__ import annotations

import os


def test_operators_md_is_current():
    from tools.gen_operators_md import OUT, render

    assert os.path.exists(OUT), "OPERATORS.md missing — run tools/gen_operators_md.py"
    on_disk = open(OUT).read()
    expected = render()
    assert on_disk == expected, (
        "OPERATORS.md is stale — run tools/gen_operators_md.py "
        "(registry changed since last generation)"
    )
