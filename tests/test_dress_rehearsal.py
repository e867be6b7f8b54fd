"""Offline quality-parity dress rehearsal as a suite gate (VERDICT r4 #2).

Runs the FULL thesis protocol in both stacks (torch reference main() vs our
train CLI) from one shared init on the committed procedural mini-Flickr
dataset, and asserts every metric pair lands inside the tolerances declared
in scripts/dress_rehearsal.py:

- epoch-0 pre-train retrieval: EXACT-level (same converted init + eval path)
- final retrieval / clip-blind / offline suite: statistical bounds
- offline_cross (our extract on the REFERENCE's final checkpoint): tight
  same-weights pipeline bounds

Both runs are fully seeded => deterministic per host. ~5 min on 1 CPU.
"""

import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import reference_available


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_dress_rehearsal_end_to_end(tmp_path):
    from scripts.dress_rehearsal import run_all

    rows, failures = run_all(
        str(tmp_path), epochs=5, n_train=60, n_val=20, seed=0
    )
    # the epoch-0 section must be present and exact-level — if these rows
    # disappeared the whole comparison is vacuous
    epoch0 = [r for r in rows if r[0] == "epoch0"]
    assert len(epoch0) >= 9
    cross = [r for r in rows if r[0] == "offline_cross"]
    assert len(cross) == 4
    assert not failures, "\n".join(failures)
