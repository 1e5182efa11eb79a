"""Property tests for the SemEval-style NER span metrics and the ME
precision/recall helper: bounds, perfect self-agreement, zero on
disjoint spans, scenario ordering (strict ≤ exact ≤ partial-f1), and a
hand-checked partial-overlap fixture."""

from hypothesis import given, settings
from hypothesis import strategies as st

PURE = settings(max_examples=200, deadline=None)

_TYPES = ['PER', 'LOC']


@st.composite
def span_list(draw, max_spans=5):
    n = draw(st.integers(0, max_spans))
    out = []
    pos = 0
    for _ in range(n):
        pos += draw(st.integers(0, 3))
        ln = draw(st.integers(1, 3))
        out.append((pos, pos + ln, draw(st.sampled_from(_TYPES))))
        pos += ln
    return out


@PURE
@given(span_list(), span_list())
def test_ner_metrics_bounds_and_scenarios(pred, gold):
    from caligraph_ray.functions.metrics import ner_span_metrics
    out = ner_span_metrics(pred, gold)
    assert set(out) == {'strict', 'exact', 'partial', 'type'}
    for sc, m in out.items():
        for k in ('precision', 'recall', 'f1'):
            assert 0.0 <= m[k] <= 1.0 + 1e-12, (sc, k)
    # strict is the hardest criterion: its f1 can never beat exact/partial
    assert out['strict']['f1'] <= out['exact']['f1'] + 1e-12
    assert out['exact']['f1'] <= out['partial']['f1'] + 1e-12


@PURE
@given(span_list())
def test_ner_metrics_perfect_on_identity(spans):
    from caligraph_ray.functions.metrics import ner_span_metrics
    if not spans:
        return
    out = ner_span_metrics(spans, spans)
    for sc in ('strict', 'exact', 'partial', 'type'):
        assert out[sc]['precision'] == 1.0
        assert out[sc]['recall'] == 1.0


def test_ner_metrics_disjoint_and_partial_fixture():
    from caligraph_ray.functions.metrics import ner_span_metrics
    # fully disjoint: everything spurious/missed
    out = ner_span_metrics([(0, 2, 'PER')], [(10, 12, 'PER')])
    for sc in ('strict', 'exact', 'partial', 'type'):
        assert out[sc]['f1'] == 0.0
    # overlap with wrong bounds, right type: partial credits 0.5, type 1.0,
    # strict/exact 0 (SemEval scenario semantics)
    out = ner_span_metrics([(0, 3, 'PER')], [(1, 3, 'PER')])
    assert out['strict']['f1'] == 0.0
    assert out['exact']['f1'] == 0.0
    assert abs(out['partial']['precision'] - 0.5) < 1e-12
    assert out['type']['precision'] == 1.0


@PURE
@given(st.dictionaries(st.integers(0, 6), st.integers(0, 3), max_size=8),
       st.dictionaries(st.integers(0, 6), st.integers(0, 3), max_size=8))
def test_me_prf_bounds_and_identity(pred, gold):
    from caligraph_ray.functions.metrics import me_prf
    out = me_prf(pred, gold)
    for k in ('precision', 'recall', 'f1'):
        assert 0.0 <= out[k] <= 1.0 + 1e-12
    if gold:
        perfect = me_prf(gold, gold)
        assert perfect['precision'] == perfect['recall'] == 1.0
