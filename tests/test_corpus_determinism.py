"""The synthetic corpus is a pure function of (seed, page index) — the
property both bench.py --scaling legs and any resumable generation rely
on. Repeated and distributed renders must be byte-identical."""


def test_generate_pages_table_is_deterministic():
    from caligraph_ray.corpus import generate_pages_table
    a = generate_pages_table(40, seed=42)
    b = generate_pages_table(40, seed=42)
    assert a.equals(b)
    c = generate_pages_table(40, seed=43)
    assert not a.equals(c)   # the seed actually matters


def test_distributed_render_matches_driver_render(ray_session):
    from caligraph_ray.corpus import generate_pages_table, pages_dataset
    want = generate_pages_table(30, seed=42).to_pandas() \
        .sort_values('url', kind='mergesort').reset_index(drop=True)
    got = pages_dataset(30, seed=42, parallelism=4).to_pandas() \
        .sort_values('url', kind='mergesort').reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col
