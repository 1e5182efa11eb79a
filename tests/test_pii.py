"""PII scrubbing stage (stages/pii.py)."""

import pandas as pd
import pytest

from caligraph_ray.stages.pii import scrub_pii, scrub_text


@pytest.fixture
def rd(ray_session):
    import ray.data
    return ray.data


def test_scrub_text_all_categories():
    text = ('Reach jane.doe+x@mail.example.org or +1-555-123-4567, '
            'server 192.168.0.17 logged it twice: 10.0.0.1.')
    scrubbed, counts = scrub_text(text)
    assert counts == {'n_email': 1, 'n_phone': 1, 'n_ip': 2}
    assert scrubbed == ('Reach [EMAIL] or [PHONE], server [IP] '
                        'logged it twice: [IP].')


def test_scrub_text_clean_passthrough():
    scrubbed, counts = scrub_text('no pii here, just words')
    assert scrubbed == 'no pii here, just words'
    assert counts == {'n_email': 0, 'n_phone': 0, 'n_ip': 0}


def test_scrub_pii_distributed_matches_scalar(ray_session, rd):
    rows = ['a@b.co and c@d.org', 'call +1-800-555-0000 now',
            'ip 8.8.8.8', 'clean']
    ds = scrub_pii(rd.from_pandas(pd.DataFrame({'text': rows})).repartition(2))
    got = ds.to_pandas().sort_values('text').reset_index(drop=True)
    for _, r in got.iterrows():
        exp_scrubbed, exp_counts = scrub_text(r['text'])
        assert r['scrubbed'] == exp_scrubbed
        for k, v in exp_counts.items():
            assert r[k] == v, (r['text'], k)


def test_scrub_pii_null_text_stays_null(ray_session, rd):
    df = pd.DataFrame({'doc_id': [1, 2],
                       'text': ['mail me a@b.com', None]})
    out = scrub_pii(rd.from_pandas(df)).to_pandas() \
        .sort_values('doc_id').reset_index(drop=True)
    assert out['scrubbed'].iloc[0] == 'mail me [EMAIL]'
    # NULL text must stay NULL, not the literal string 'None'
    assert pd.isna(out['scrubbed'].iloc[1])
    assert int(out['n_email'].iloc[1]) == 0
