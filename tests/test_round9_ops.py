"""Invariance tests for the round-9 session-2 operators.

The DuckDB hash compare (scripts/check_queries.py / the driver) is the
value-level gate; these tests assert the METRIC-LEVEL invariants that a
hash compare cannot see (both engines could compute the same wrong
number): AUC/ROC consistency laws, coverage-curve monotonicity, posting
prefix bounds, Parseval-style spectral bounds, kappa's range.
"""

from __future__ import annotations

from nyuki_spark.queries import REGISTRY


def _rows(spark, sf_dir, qid):
    return REGISTRY[qid].run(spark, sf_dir).collect()


def test_roc_auc_laws(spark, sf_dir):
    rows = _rows(spark, sf_dir, "llm_roc_auc")
    assert len(rows) == 9
    auc = {r.auc for r in rows}
    assert len(auc) == 1, "AUC is a global constant across threshold rows"
    assert 0.0 <= auc.pop() <= 1.0
    n_pos = {r.tp + r.fn for r in rows}
    n_neg = {r.fp + r.tn for r in rows}
    assert len(n_pos) == 1 and len(n_neg) == 1, "marginals are invariant"
    # Raising the threshold can only shrink the predicted-positive set.
    by_t = sorted(rows, key=lambda r: r.threshold)
    for lo, hi in zip(by_t, by_t[1:]):
        assert hi.tp <= lo.tp and hi.fp <= lo.fp
        assert hi.tpr <= lo.tpr and hi.fpr <= lo.fpr


def test_vocab_coverage_curve(spark, sf_dir):
    rows = _rows(spark, sf_dir, "llm_vocab_coverage")
    assert rows, "frequency census is non-empty"
    # Ordered by f DESC: cumulatives strictly increase, coverage ends at 1.
    for a, b in zip(rows, rows[1:]):
        assert a.f > b.f
        assert b.cum_types == a.cum_types + b.n_types
        assert b.cum_tokens == a.cum_tokens + b.f * b.n_types
        assert a.coverage <= b.coverage
    last = rows[-1]
    assert last.coverage == 1.0
    assert last.cum_tokens == sum(r.f * r.n_types for r in rows)


def test_inverted_index_postings(spark, sf_dir):
    rows = _rows(spark, sf_dir, "llm_inverted_index")
    assert 0 < len(rows) <= 50
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert len(ids) == min(r.df, 10), "prefix length is min(df, 10)"
        assert ids == sorted(ids), "postings ascend by doc_id"
        assert len(set(ids)) == len(ids), "per-doc dedup held"


def test_goertzel_spectral_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "mm_audio_goertzel")
    assert len(rows) == 48 * 4
    for r in rows:
        assert r.n_samples == 400 + (r.doc_id % 5) * 80
        assert r.power >= 0.0
        # |X_k|/N <= max|s|: bin power can never exceed the amplitude
        # bound (125^2) — a fixed-point overflow or a twiddle-scale slip
        # breaks this long before it breaks a self-consistent hash.
        assert r.power <= 125.0**2
        assert abs(r.re_q) <= 126 * 10**6 * r.n_samples
        assert abs(r.im_q) <= 126 * 10**6 * r.n_samples


def test_cohens_kappa_range(spark, sf_dir):
    (row,) = _rows(spark, sf_dir, "stat_cohens_kappa")
    n = row.n11 + row.n10 + row.n01 + row.n00
    assert n > 0
    assert 0.0 <= row.po <= 1.0 and 0.0 <= row.pe <= 1.0
    if row.kappa is not None:
        assert -1.0 <= row.kappa <= 1.0


def test_pca2_orthogonal_basis(spark, sf_dir):
    rows = _rows(spark, sf_dir, "llm_pca2_basis")
    assert len(rows) == 64
    e1 = {r.eigenvalue1 for r in rows}
    e2 = {r.eigenvalue2 for r in rows}
    assert len(e1) == 1 and len(e2) == 1
    # Both eigenvalue estimates are Rayleigh-style UNDERESTIMATES at 8
    # fixed steps, so the ordering only holds up to the convergence gap
    # (near-degenerate spectra at tiny SF) — hence the tolerance.
    l1, l2 = e1.pop(), e2.pop()
    assert l1 >= l2 - 0.5 and l2 >= 0.0
    for name in ("pc1", "pc2"):
        nrm = sum(getattr(r, name) ** 2 for r in rows)
        assert abs(nrm - 1.0) < 1e-3, f"{name} is unit-norm"
    # Per-step re-orthogonalization makes this exact up to the 6-dp pin.
    dot = sum(r.pc1 * r.pc2 for r in rows)
    assert abs(dot) < 1e-4, "deflated component is orthogonal to the first"


def test_mrl_truncation_census(spark, sf_dir):
    rows = _rows(spark, sf_dir, "llm_mrl_truncation")
    assert rows
    for r in rows:
        assert 0 <= r.bucket <= 19
        assert 0.0 <= r.min_ret <= r.max_ret <= 1.0
        # bucket edges bound the retained range it aggregates
        assert r.min_ret >= r.bucket / 20.0 - 1e-9
        if r.bucket < 19:
            assert r.max_ret < (r.bucket + 1) / 20.0 + 1e-9


def test_chat_template_boundaries(spark, sf_dir):
    rows = _rows(spark, sf_dir, "llm_sft_chat_template")
    assert rows
    for r in rows:
        assert r.loss_start == r.n_prompt_tokens + 2
        assert r.n_total_tokens >= r.n_prompt_tokens + 3
        assert r.fits_context == (r.n_total_tokens <= 512)
        assert len(r.render_md5) == 32


def test_sax_symbol_cuts(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ts_sax_symbols")
    assert rows
    for r in rows:
        assert r.sax in ("a", "b", "c", "d", "_")
        if r.z is not None:
            expected = (
                "a" if r.z < -0.6745 else
                "b" if r.z < 0 else
                "c" if r.z < 0.6745 else "d"
            )
            # z is 6-dp rounded; only breakpoint-adjacent values can
            # legitimately disagree with the unrounded cut.
            if min(abs(r.z + 0.6745), abs(r.z), abs(r.z - 0.6745)) > 1e-5:
                assert r.sax == expected
    # z-normalization: symbols are not all identical on real data
    assert len({r.sax for r in rows}) > 1


def test_dp_counts_noise_bounded(spark, sf_dir):
    rows = _rows(spark, sf_dir, "stat_dp_counts")
    assert rows
    for r in rows:
        assert r.epsilon == 1.0
        noise = r.n_noisy - r.n_true
        # Laplace(1) from u=(x+0.5)/2^32: the extreme draws (x=0 or
        # x=2^32-1) give |noise| = -ln(2^-32) = 32*ln(2) ~ 22.181
        assert abs(noise) <= 22.19
        assert noise != 0.0, "the mechanism actually perturbs"


def test_cep_funnel_chain_laws(spark, sf_dir):
    rows = _rows(spark, sf_dir, "stream_cep_funnel_live")
    assert rows, "at least one user completes the funnel"
    for r in rows:
        assert r.view_ts < r.click_ts < r.purchase_ts, "strict chain order"
        gap = (r.purchase_ts - r.view_ts).total_seconds()
        assert gap <= 7 * 86400, "whole chain inside the anchor window"
        assert r.user_id >= 0, "sentinel group never emits"
    ids = [r.user_id for r in rows]
    assert len(ids) == len(set(ids)), "exactly one match row per user"


def test_ivfpq_ranking_laws(spark, sf_dir):
    rows = _rows(spark, sf_dir, "llm_knn_ivfpq")
    assert len(rows) == 10
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists), "ADC distances ascend"
    assert all(d >= 0.0 for d in dists)
    assert all(r.vec_id != 0 for r in rows), "query vector is not a candidate"


def test_sax_motifs_are_repeats(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ts_sax_motifs")
    for r in rows:
        assert r.n > 1, "a motif is a repeated word"
        assert len(r.word) == 3
        assert set(r.word) <= set("abcd_")
        assert r.first_day <= r.last_day
