"""Property tests for the Misra-Gries fold (dumpr_spark.streaming.state
.mg_fold) — the guarantee classically proven on paper, checked on random
streams at volume the Spark-level tests can't afford:

  for every key: true_count - n/(k+1) <= stored_count <= true_count,
  where stored_count = 0 if the key is untracked. In particular any key
  with true_count > n/(k+1) MUST be tracked, and the counter map never
  exceeds k entries at any point.

Also: batch-splitting invariance — folding a stream in one call equals
folding it in arbitrary prefix/suffix chunks with carried state (what the
micro-batch boundary does).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

from dumpr_spark.streaming.state import mg_fold

# streams over a small alphabet (forces collisions + evictions) mixed with
# a wide alphabet (forces capacity churn)
_keys = st.one_of(
    st.integers(min_value=0, max_value=5).map(lambda i: f"hot{i}"),
    st.integers(min_value=0, max_value=500).map(lambda i: f"t{i}"),
)
_streams = st.lists(_keys, min_size=0, max_size=2000)
_ks = st.integers(min_value=1, max_value=12)


@settings(max_examples=200, deadline=None)
@given(stream=_streams, k=_ks)
def test_mg_bound_and_capacity(stream, k):
    counters, n = mg_fold({}, stream, k)
    assert n == len(stream)
    assert len(counters) <= k
    true = Counter(stream)
    bound = n / (k + 1)
    for key, cnt in true.items():
        stored = counters.get(key, 0)
        assert stored <= cnt
        assert stored >= cnt - bound
        if cnt > bound:
            assert key in counters


@settings(max_examples=100, deadline=None)
@given(stream=_streams, k=_ks, cut=st.integers(min_value=0, max_value=2000))
def test_mg_batch_split_invariance(stream, k, cut):
    cut = min(cut, len(stream))
    one_shot, n1 = mg_fold({}, stream, k)
    c, na = mg_fold({}, stream[:cut], k)
    resumed, nb = mg_fold(c, stream[cut:], k)
    assert n1 == na + nb == len(stream)
    assert resumed == one_shot
