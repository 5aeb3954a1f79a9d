"""Fast-tier budget guard (round-3 VERDICT weak #6 / next #8): the
``-m "not slow"`` tier drifted +30% over two rounds because nothing
caught new unmarked tests in-round.  This meta-test pins the fast-tier
*collection count* — a cheap proxy for its wall-clock budget
(documented in CLAUDE.md: ~4-4.5 min at nproc=1 with -n 2).

When this trips: either slow-mark your new test in
tests/conftest.py::SLOW_FILES/SLOW_TESTS, or — if it genuinely belongs
in the fast tier — re-measure the tier (``pytest -m "not slow" -n 2``
at nproc=1), update the CLAUDE.md budget note, and raise the ceiling
here in the same commit.
"""

# Fast-tier collection as of the round-5 serving/guard/bench additions:
# 167 selected items (157 passed + 9 skipped + the guard), measured
# 6:02 at nproc=1 with -n 2 (kept additions: make_server cached parity,
# the reject-nonfinite sane-trajectory no-op oracle, and the three
# pure-logic bench record/flag tests; guard explosion + fit-auto +
# density-server + MXU-backward grads ride slow).  The ceiling allows
# a few genuinely-cheap additions before forcing a re-measure.
FAST_TIER_MAX_ITEMS = 170


def test_fast_tier_collection_count(request):
    items = request.session.items
    # only meaningful for a whole-suite run; single-file / -k runs
    # collect a subset
    import pytest
    if len(items) < 100:
        pytest.skip("partial collection (not a full fast-tier run)")
    fast = [i for i in items if "slow" not in i.keywords]
    assert len(fast) <= FAST_TIER_MAX_ITEMS, (
        f"fast tier grew to {len(fast)} collected items "
        f"(> {FAST_TIER_MAX_ITEMS}): slow-mark the new tests in "
        f"tests/conftest.py, or re-measure the tier and raise the "
        f"ceiling + CLAUDE.md budget note in the same commit")
