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
    """compact_record must return a <1800 B line even in pathological
    cases: it degrades 2 dp -> 1 dp -> drops smallest-time entries
    (with an "omitted" count; full timings stay in BENCH_SELF.json)."""
    from bench import compact_record

    names = _headline()
    assert len(names) == len(set(names)), "duplicate headline entries"
    # worst case: EVERY query ~10 s (the actual sf0.1 total is ~100 s
    # across all of them; single queries peak under 5 s). At 75+
    # headline entries the 1800 B line cannot hold every entry at ANY
    # precision (name bytes dominate), so smallest-time entries drop —
    # reported via "omitted", full timings always in BENCH_SELF.json.
    # The growth-invariant pin: when entries drop, the record must sit
    # CLOSE to the cap (greedy smallest-first removal stops the moment
    # it fits, so a minimal-drop line lands within one ~35 B entry of
    # 1800 — a record far below the cap would mean over-dropping), and
    # the clear majority of entries must survive.
    def check_minimal_drop(rec: str, doc: dict, n_names: int) -> None:
        assert len(rec) < 1800
        assert doc.get("omitted", 0) == n_names - len(doc["queries"])
        if doc.get("omitted", 0):
            assert len(rec) > 1800 - 40, len(rec)
        # retention floor: 1800 B holds ~75-80 entries at ~21 B each
        # (name + ":10.0,"), so a 3/4 fraction stopped being possible
        # once the headline list passed ~100 queries (r13: 113). Pin
        # the ABSOLUTE floor the capture can actually hold instead —
        # over-dropping (a record far below the cap) is still caught
        # by the close-to-cap assert above.
        assert len(doc["queries"]) >= min(n_names, 70)

    rec = compact_record({n: 9.99 for n in names}, 729.27, 0.1, 3)
    doc = json.loads(rec)
    assert doc["value"] == 729.27
    check_minimal_drop(rec, doc, len(names))

    # the ACTUAL timing profile (mostly sub-second, few multi-second)
    realistic = {n: (0.3 if i % 3 else 2.5) for i, n in enumerate(names)}
    rec = compact_record(realistic, 100.0, 0.1, 3)
    check_minimal_drop(rec, json.loads(rec), len(names))

    # pathological: triple-digit everything AND 80 extra queries —
    # must still parse, dropping the smallest entries first
    big = {f"query_with_a_long_name_{i:03d}": 0.01 * i for i in range(80)}
    big.update({n: 123.45 for n in names})
    rec = compact_record(big, 12345.67, 0.1, 3)
    assert len(rec) < 1800
    doc = json.loads(rec)
    assert doc["omitted"] == len(big) - len(doc["queries"])
    # the big-ticket entries survive; only small ones are dropped
    assert all(v >= 0.1 for v in doc["queries"].values())


def test_printed_query_set_is_deterministic():
    """VERDICT r16 #3: the r16 policy dropped the SMALLEST-time entries,
    so the printed set varied with timings and PERF misread one newly-
    fast query as dropped_from_bench. The omission set is now fixed BY
    NAME (PRINT_OMIT): any two timing profiles in the realistic range
    must print the identical query set — exactly HEADLINE - PRINT_OMIT,
    which is precisely the 75 queries the r16 record printed."""
    from bench import PRINT_OMIT, compact_record

    names = _headline()
    assert PRINT_OMIT <= set(names)
    profile_a = {n: 0.7 for n in names}
    profile_b = {n: (0.1 if i % 2 else 4.9) for i, n in enumerate(names)}
    keys_a = set(json.loads(compact_record(profile_a, 87.5, 0.1, 3))["queries"])
    keys_b = set(json.loads(compact_record(profile_b, 87.5, 0.1, 3))["queries"])
    assert keys_a == keys_b == set(names) - PRINT_OMIT
    assert len(keys_a) == 75


def test_headline_queries_all_exist():
    import __spark_entry__ as entry

    qs = entry.queries()
    missing = [n for n in _headline() if n not in qs]
    assert not missing, f"headline names without queries(): {missing}"
