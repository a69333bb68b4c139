"""Driver-contract wiring invariants: every oracle key names a query, the
rows-only set is exactly the documented approximate/RNG operators, and
every queries() entry is callable."""


def _dicts():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.queries(), m.oracle_sql()


ROWS_ONLY = {
    # approximate / RNG-body operators, each pytest-pinned to an exact twin
    "events_user_hll", "events_value_quantiles_sketch",
    "events_user_heavy_hitters", "media_features",
    "embedding_lsh_topk", "embedding_ivf_topk",
}


def test_oracle_keys_subset_and_rows_only_exact():
    qs, os_ = _dicts()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))
    assert set(qs) - set(os_) == ROWS_ONLY
    assert all(callable(v) for v in qs.values())
    assert all(isinstance(v, str) and v.strip() for v in os_.values())
