"""F1-F3 unit parsers: exact reference cases (profile_analyzer.py:341-403)
and pp->parse round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_workload_analyzer_spark.functions import units


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r[0] for r in df.select(fn(F.col("s"))).collect()]


def test_pp_size_to_bytes(spark):
    # profile_analyzer.py:341-360: 1024-based, specials '0' and '-1.00 B'
    cases = {
        "278.73 KB": int(278.73 * 1024),
        "1.00 GB": 1024**3,
        "2.50 MB": int(2.5 * 1024**2),
        "512 B": 512,
        "0": 0,
        "-1.00 B": -1,
    }
    got = _apply(spark, units.pp_size_to_bytes, list(cases))
    assert got == list(cases.values())


def test_pp_number_to_units(spark):
    # profile_analyzer.py:362-380: DECIMAL units B=1e9 M=1e6 K=1e3
    cases = {"2.85K": 2850, "1.20M": 1200000, "3B": 3000000000, "42": 42, "-1": -1}
    got = _apply(spark, units.pp_number_to_units, list(cases))
    assert got == list(cases.values())


def test_pp_time_to_ns(spark):
    # profile_analyzer.py:382-403: compound additive h/m/s/ms/us/ns
    cases = {
        "795.202us": 795202,
        "1h2m": 3600 * 10**9 + 2 * 60 * 10**9,
        "250ms": 250 * 10**6,
        "1.5s": 1500000000,
        "30ns": 30,
        "1m30s": 90 * 10**9,
    }
    got = _apply(spark, units.pp_time_to_ns, list(cases))
    assert got == list(cases.values())


def test_size_roundtrip(spark):
    """parse(pp(x)) == x within formatter precision (2 decimals)."""
    xs = [0, 1, 1023, 1024, 10**6, 5 * 1024**2, 3 * 1024**3]
    df = spark.createDataFrame([(x,) for x in xs], ["b"])
    rows = df.select(
        "b", units.pp_size_to_bytes(units.pp_bytes(F.col("b"))).alias("rt")
    ).collect()
    for r in rows:
        unit = max(1, 1024 ** min(3, max(0, (r["b"].bit_length() - 1) // 10)))
        assert abs(r["rt"] - r["b"]) <= unit * 0.005 + 1, r


def test_cluster_id_is_order_insensitive(spark):
    df = spark.createDataFrame(
        [(["b:22000", "a:22000"],), (["a:22000", "b:22000"],)], ["hosts"]
    )
    vals = [r[0] for r in df.select(units.cluster_id(F.col("hosts"))).collect()]
    assert vals[0] == vals[1]
    assert len(vals[0]) == 32


def test_pp_scanners_match_regex_spec():
    """The hand-scanned _pp_* hot paths must agree with the regex spec
    (the faithful reference ports) on any well-formed pretty-printed
    string — same floats, same accumulation order, bit-identical ints."""
    import random

    from impala_workload_analyzer_spark.sources import profiles as P

    def spec_size(s):
        g = P._SIZE_RE.match(s).groupdict()
        t = 0.0
        for k, m in (("GB", 1024**3), ("MB", 1024**2), ("KB", 1024), ("B", 1)):
            if g[k] is not None:
                t += float(g[k]) * m
        return int(t)

    def spec_num(s):
        g = P._NUM_RE.match(s).groupdict()
        t = 0.0
        for k, m in (("B", 10**9), ("M", 10**6), ("K", 10**3), ("S", 1)):
            if g[k] is not None:
                t += float(g[k]) * m
        return int(t)

    def spec_time(s):
        g = P._TIME_RE.match(s).groupdict()
        t = 0.0
        for k, m in (("h", 3600 * 10**9), ("m", 60 * 10**9), ("s", 10**9),
                     ("ms", 10**6), ("us", 10**3), ("ns", 1)):
            if g[k] is not None:
                t += float(g[k]) * m
        return int(t)

    rnd = random.Random(7)

    def num():
        return rnd.choice([str(rnd.randint(0, 999)),
                           f"{rnd.uniform(0, 999):.1f}",
                           f"{rnd.uniform(0, 9):.2f}"])

    for _ in range(5000):
        parts = []
        for unit in ("GB", "MB", "KB"):
            if rnd.random() < .4:
                parts.append(num() + (" " if rnd.random() < .5 else "") + unit)
        if rnd.random() < .4:
            parts.append(("-" if rnd.random() < .2 else "") + num()
                         + (" " if rnd.random() < .5 else "") + "B")
        s = "".join(parts) if parts else rnd.choice(["", "0"])
        assert spec_size(s) == P._pp_size(s), s

        parts = []
        for unit in ("B", "M", "K"):
            if rnd.random() < .4:
                parts.append(num() + unit)
        if rnd.random() < .4:
            parts.append(("-" if rnd.random() < .2 else "") + num())
        s = "".join(parts)
        assert spec_num(s) == P._pp_number(s), s

        parts = []
        for unit in ("h", "m", "s", "ms", "us", "ns"):
            if rnd.random() < .35:
                parts.append(num() + unit)
        s = "".join(parts)
        assert spec_time(s) == P._pp_time(s), s


# --- property-based round-7 integer kernels (hypothesis, no Spark) ----------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1,
                max_size=200))
def test_cusum_prefix_form_equals_recurrence(zs):
    """ev23/st13's closed form S_k = P_k - min(0, min_{j<=k} P_j) must equal
    the literal reset-at-zero recurrence S_k = max(0, S_{k-1} + z_k) for
    ANY integer increment sequence."""
    s = 0
    recurrence = []
    for z in zs:
        s = max(0, s + z)
        recurrence.append(s)
    p = 0
    runmin = 0
    closed = []
    for z in zs:
        p += z
        runmin = min(runmin, p)
        closed.append(p - min(0, runmin))
    assert closed == recurrence


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1,
                max_size=100))
def test_plt1_bin_recipe_covers_and_partitions(data):
    """plt1's integer bin arithmetic (the reference's py2 hist recipe) must
    produce >= 10 uniform bins whose clamped index assignment places every
    value, with totals conserved and every value inside its bin (last bin
    right-inclusive)."""
    mn, mx = min(data), max(data)
    step = max(1, (mx - mn) // 10)
    stop = max(mn + step * 11, mx + step)
    edges = list(range(mn, stop, step))
    nbins = len(edges) - 1
    assert nbins >= 10
    assert all(b - a == step for a, b in zip(edges, edges[1:]))
    heights = [0] * nbins
    for v in data:
        i = min((v - mn) // step, nbins - 1)
        assert 0 <= i < nbins
        # bin containment: [edge_i, edge_i+1), last bin right-inclusive
        assert edges[i] <= v
        assert v < edges[i] + step or (i == nbins - 1 and v <= edges[i] + step)
        heights[i] += 1
    assert sum(heights) == len(data)
    assert mx <= edges[-1] + step  # the grid always covers the data


@given(st.sets(st.integers(min_value=0, max_value=500), max_size=60))
@settings(max_examples=200, deadline=None)
def test_islands_grouping_equals_naive_runs(buckets):
    """ev25/st14's islands formula: grouping missing hours by
    ``h/3600 - rank`` must decompose any hour set into exactly the
    naive consecutive runs (same count, same lengths, same max)."""
    hours = sorted(3600 * b for b in buckets)
    groups: dict[int, int] = {}
    for rank, h in enumerate(hours, start=1):
        groups[h // 3600 - rank] = groups.get(h // 3600 - rank, 0) + 1
    naive = []
    for h in hours:
        if naive and h - naive[-1][-1] == 3600:
            naive[-1].append(h)
        else:
            naive.append([h])
    assert sorted(groups.values()) == sorted(len(r) for r in naive)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.sets(st.integers(min_value=0, max_value=50), max_size=8),
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_first_bucket_trick_equals_cumulative_distinct(docs):
    """tx24's one-pass formula: summing per-word first-occurrence
    buckets must equal the naive cumulative-distinct recomputation for
    any doc->bucket assignment and any word sets."""
    first: dict[int, int] = {}
    for b, words in docs:
        for w in words:
            first[w] = min(first.get(w, b), b)
    seen: set = set()
    for b in range(10):
        for bb, words in docs:
            if bb <= b:
                seen.update(words)
        cum_via_first = sum(1 for fb in first.values() if fb <= b)
        assert cum_via_first == len(seen)
        seen = set(seen)


@given(
    st.integers(min_value=1, max_value=8),
    st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_cell_rank_recall_equals_search_simulation(ncells, neighbor_cells):
    """sim20's sweep formula: counting true neighbors whose cell rank
    <= p must equal simulating the probe search at every depth p, for
    any query cell ordering and any neighbor cell assignment."""
    order = list(range(ncells))  # the query's cell ranking (rank = idx+1)
    cells = [c % ncells for c in neighbor_cells]
    rank_of = {c: i + 1 for i, c in enumerate(order)}
    for p in range(1, ncells + 1):
        probed = set(order[:p])
        simulated = sum(1 for c in cells if c in probed)
        via_rank = sum(1 for c in cells if rank_of[c] <= p)
        assert simulated == via_rank
