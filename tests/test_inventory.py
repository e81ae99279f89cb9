"""Dead-inventory guard (VERDICT r4 task 7): SURVEY.md §2B's declared
key list and the live query registry must agree in BOTH directions, so
inventory drift cannot silently reopen."""

from __future__ import annotations

import re
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def survey_2b_keys() -> set[str]:
    text = (_REPO / "SURVEY.md").read_text()
    start = text.index("### 2B.")
    end = text.index("### 2C.")
    section = text[start:end]
    # table rows lead with a backticked key in the first cell
    return set(re.findall(r"^\| `([a-z0-9_]+)`", section, flags=re.M))


def test_survey_matches_registry_both_ways():
    import __spark_entry__ as e

    declared = survey_2b_keys()
    registered = set(e.queries())
    assert declared - registered == set(), sorted(declared - registered)
    assert registered - declared == set(), sorted(registered - declared)


def test_every_oracle_key_is_registered():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs), sorted(set(osql) - set(qs))
