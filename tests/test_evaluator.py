"""Evaluator unit tests (chunking policy; the render path itself is
covered by the trainer/CLI e2e tests)."""


def test_pick_eval_chunk_policy():
    """Pad-aware auto-chunk (VERDICT r4 #7): full-frame ray counts pick
    32768 (+14% measured, PERF.md chunk sweep), fixture-sized frames
    avoid 3-4x padding."""
    from arah_tpu.eval.evaluator import pick_eval_chunk
    assert pick_eval_chunk(260_000) == 32768      # 512^2 full frame
    assert pick_eval_chunk(1_000) == 8192         # tiny fixture frame
    assert pick_eval_chunk(10_000) == 16384
    # padded-work x throughput tradeoff: one extra 32k chunk of padding
    # loses to 16k chunks here
    assert pick_eval_chunk(300_000) == 16384
