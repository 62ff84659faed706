"""Unit tests for the HLO collective audit parser (parallel/audit.py).

The round-5 fix under test: tuple-typed collectives — e.g. the
tensor-parallel fused psum ``(f32[8,32], f32[1,8]) all-reduce(...)`` —
were silently missed by the old single-token result-type pattern, and a
tuple's payload must sum its elements."""

from genjax_tpu.parallel.audit import hlo_collectives

HLO = """\
HloModule jit_f

%body.1 (p: (f32[4], f32[4])) -> (f32[4], f32[4]) {
  %ar0 = f32[4]{0} all-reduce(%x), replica_groups={{0,1},{2,3}}, to_apply=%sum
  %tup = (f32[8,32]{1,0}, f32[1,8]{1,0}) all-reduce(%a, %b), channel_id=1, replica_groups={{0,4},{1,5},{2,6},{3,7}}, to_apply=%sum
  ROOT %t = tuple(%ar0, %tup)
}

ENTRY %main (p0: f32[4]) -> f32[4] {
  %w = (s32[], f32[4]) while(%init), body=%body.1, condition=%cond.2
  %ag = f32[16]{0} all-gather(%y), replica_groups=[2,4]<=[8], dimensions={0}
  ROOT %r = f32[4] get-tuple-element(%w), index=1
}
"""


def test_tuple_collective_is_counted_with_summed_payload():
    audit = hlo_collectives(HLO)
    assert audit["count"] == 3
    assert audit["by_kind"] == {"all-reduce": 2, "all-gather": 1}
    # tuple payload = 8*32*4 + 1*8*4 = 1056; scalar f32[4] = 16;
    # all-gather f32[16] = 64
    assert audit["bytes"] == 1056 + 16 + 64
    # the two all-reduces live in the while body -> per-step
    assert audit["per_step"] == {"count": 2, "bytes": 1056 + 16}
    spans = {o["kind"]: o["group_span"] for o in audit["ops"]}
    assert spans["all-reduce"] == 2  # explicit groups of 2
    assert spans["all-gather"] == 4  # iota [2,4]<=[8]: groups of 4


ASYNC_HLO = """\
HloModule jit_g

ENTRY %main (p0: f32[8,32]) -> f32[8,128] {
  %ars = (f32[8,32]{1,0}, f32[8,32]{1,0}) all-reduce-start(%p0), replica_groups={{0,1},{2,3}}, to_apply=%sum
  %ard = f32[8,32]{1,0} all-reduce-done(%ars)
  %ags = (f32[8,32]{1,0}, f32[8,128]{1,0}) all-gather-start(%ard), replica_groups={{0,1,2,3}}, dimensions={1}
  ROOT %agd = f32[8,128]{1,0} all-gather-done(%ags)
}
"""


def test_async_start_done_pair_counts_once():
    """An async collective's -start/-done pair is ONE transfer: one op,
    payload = the RESULT half of the -start's aliasing tuple — summed
    per shape, since all-gather-start's result is larger than its
    operand (the old parser counted 2 ops / ~3x bytes per async op)."""
    audit = hlo_collectives(ASYNC_HLO)
    assert audit["count"] == 2
    assert audit["by_kind"] == {"all-reduce": 1, "all-gather": 1}
    # all-reduce result 8*32*4 + all-gather result 8*128*4
    assert audit["bytes"] == 8 * 32 * 4 + 8 * 128 * 4


ROOT_HLO = """\
HloModule jit_h

ENTRY %main (p0: f32[8,32]) -> f32[8,32] {
  ROOT %ar = f32[8,32]{1,0} all-reduce(%p0), replica_groups={{0,1}}, to_apply=%sum
}
"""


def test_root_collective_is_counted():
    """A collective that is a computation ROOT must not be dropped."""
    audit = hlo_collectives(ROOT_HLO)
    assert audit["count"] == 1
    assert audit["bytes"] == 8 * 32 * 4
