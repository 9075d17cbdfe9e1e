"""Golden-order pin for the query registry.

The driver grades registry entries by position (the 50-slot priority
window), so the ORDER of get_registry() is contract, not cosmetics.
This pin makes any reordering — including an accidental one from the
queries-package split — an explicit, reviewed change: regenerate the
golden file only when the order is *meant* to move (e.g. the per-round
rotation via tools/gen_priority_order.py --write, which must update
both together).
"""

from pathlib import Path

from miniodb_spark.queries import get_registry

GOLDEN = Path(__file__).with_name("golden_registry_order.txt")


def test_registry_order_matches_golden():
    got = list(get_registry())
    want = GOLDEN.read_text().splitlines()
    # TWO-SIDED (r15 verdict #2): the old prefix-only check let new
    # entries append past the golden tail, which silently defeated the
    # per-addition rotation rule — round 15's nine audits shipped with
    # zero external grades because the stale golden head-50 was what
    # the driver actually ran. An uncommitted rotation now fails here.
    assert len(got) == len(want), (
        f"registry has {len(got)} entries but the golden file pins "
        f"{len(want)} — run tools/gen_priority_order.py --write after "
        "ANY registry addition and commit the rotation"
    )
    assert got == want, (
        "registry order drifted from tests/golden_registry_order.txt — "
        "if intentional (rotation), regenerate the golden file"
    )


def test_every_entry_has_fn_and_alias_discipline():
    reg = get_registry()
    for name, spec in reg.items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
