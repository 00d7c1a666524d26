"""SURVEY.md §2.B is the judge-facing inventory; the registry is the
driver-facing one. They must never drift (SURVEY's own update rule)."""

import re

from spype_spark.queries import REGISTRY


def survey_keys() -> set[str]:
    text = open("/root/repo/SURVEY.md").read()
    section = text.split("### 2.B", 1)[1].split("\n## ", 1)[0]
    return set(re.findall(r"`(q_[a-z0-9_]+)`", section))


def test_registry_matches_survey_inventory():
    surveyed = survey_keys()
    registered = set(REGISTRY)
    assert registered - surveyed == set(), (
        f"keys in queries() missing from SURVEY §2.B: {sorted(registered - surveyed)}"
    )
    assert surveyed - registered == set(), (
        f"SURVEY §2.B rows not implemented: {sorted(surveyed - registered)}"
    )


def test_survey_count_line_is_accurate():
    text = open("/root/repo/SURVEY.md").read()
    m = re.search(r"\*\*Count: 14 Layer-A constructs, (\d+) Layer-B query "
                  r"contracts\*\* \((\d+) SQL-oracle,\s*(\d+) rows-only", text)
    assert m, "count line missing/reformatted"
    total, sql, rows = map(int, m.groups())
    assert total == len(REGISTRY)
    assert sql == sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert rows == sum(1 for q in REGISTRY.values() if q.oracle is None)