"""Queue-discipline properties of tools/rotate_window.py (VERDICT r15 #1)."""

import importlib.util
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "rotate_window", REPO / "tools" / "rotate_window.py"
)
rw = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rw)


def test_rotate_queue_discipline():
    old = [f"q{i}" for i in range(174)]
    changed = ["q60", "q170", "brand_new", "q3"]
    new = rw.rotate(old, changed)
    # changed lead, in the given order
    assert new[:4] == changed
    # window fill comes from the head of the old tail (oldest-checked)
    fill = new[4:50]
    expected_fill = [n for n in old[50:] if n not in changed][:46]
    assert fill == expected_fill
    # the just-checked old window rotates to the very tail, order-stable
    old_window_kept = [n for n in old[:50] if n not in changed]
    assert new[-len(old_window_kept):] == old_window_kept
    # nothing lost, nothing duplicated
    assert sorted(new) == sorted(set(old) | {"brand_new"})


def test_rotate_changed_dedup_and_identity():
    old = [f"q{i}" for i in range(100)]
    new = rw.rotate(old, ["q1", "q1"])
    assert new.count("q1") == 1
    # rotating with no changes still cycles the window to the tail
    cycled = rw.rotate(old, [])
    assert cycled == old[50:] + old[:50]


def test_read_order_matches_entry():
    src = (REPO / "__spark_entry__.py").read_text()
    order = rw.read_order(src)
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    assert order == list(entry.queries().keys())


def test_dry_run_round_trips_manifest_shape():
    out = subprocess.run(
        [sys.executable, "tools/rotate_window.py", "--round", "98",
         "--changed", "dedup_exact", "--dry-run"],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    m = json.loads(out.stdout)
    assert m["round"] == 98
    assert m["window"][0] == "dedup_exact"
    assert len(m["window"]) == 50


def test_rotate_age_based_fill():
    """r16: the fill portion picks the OLDEST greens by CORRECTNESS
    age, not queue position — jump-to-front rotations drift the queue
    away from age; position remains the in-cohort tie-break."""
    old = [f"q{i}" for i in range(120)]
    last = {n: 5 for n in old}
    for i in range(100, 120):
        last[f"q{i}"] = 1  # deep tail, genuinely stalest
    new = rw.rotate(old, ["q3"], last)
    fill = new[1:50]
    assert fill[:20] == [f"q{i}" for i in range(100, 120)]
    assert fill[20:] == [n for n in old[50:100] if n != "q3"][:29]


def test_read_last_green_matches_history():
    import json

    last = rw.read_last_green(99)
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    assert files
    # spot-check: every query in the newest file maps to that round
    import re
    newest = files[-1]
    r = int(re.search(r"r(\d+)", newest.name).group(1))
    for name in json.loads(newest.read_text()):
        assert last[name] == r
