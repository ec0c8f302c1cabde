"""The printed bench record must stay inside the driver's bounded
(~2 kB) tail capture — rounds 5 and 6 both shipped unparseable records
when the line outgrew it (VERDICT r6 item 1). This pins the compact
form's worst-case size against the CURRENT headline list, so adding
queries without re-checking the budget fails here instead of in the
round record."""

import json
import re


def _headline() -> list[str]:
    src = open("bench.py").read()
    block = re.search(r"HEADLINE = \[(.*?)\]", src, re.S).group(1)
    return re.findall(r'"([^"]+)"', block)


def test_compact_record_fits_driver_capture_worst_case():
    names = _headline()
    assert len(names) == len(set(names)), "duplicate headline entries"
    # worst case at 2 dp: every query needs 6 chars (e.g. 123.45) and
    # the total needs 8 (e.g. 12345.67)
    record = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 12345.678,
            "unit": "sec",
            "sf": 0.1,
            "reps": 3,
            "queries": {n: 123.45 for n in names},
        },
        separators=(",", ":"),
    )
    assert len(record) < 1800, (
        f"worst-case compact record is {len(record)} B for {len(names)} "
        "headline queries — trim names or drop to 1 dp before the next "
        "round ships another parsed:null"
    )


def test_headline_queries_all_exist():
    import __spark_entry__ as entry

    qs = entry.queries()
    missing = [n for n in _headline() if n not in qs]
    assert not missing, f"headline names without queries(): {missing}"
