"""Classical-ML operators (operators/ml.py): naive Bayes classification
quality + OOV handling, and closed-form multi-feature OLS vs numpy."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from pyspark_excel_datasource_spark.operators.ml import (
    q_nb_classify,
    q_regression_multi,
)

SF = "/root/testdata/sf0.001"


def _python_nb(train, test):
    """Reference multinomial NB (Laplace +1, ascending-order log-prob
    fold, lexicographic tie-break) in pure Python."""
    import math
    from collections import Counter, defaultdict

    counts: dict[str, Counter] = defaultdict(Counter)
    totals: Counter = Counter()
    class_docs: Counter = Counter()
    vocab: set[str] = set()
    for lang, text in train:
        toks = text.lower().split(" ")
        counts[lang].update(toks)
        totals[lang] += len(toks)
        class_docs[lang] += 1
        vocab.update(toks)
    v = len(vocab)
    nd = sum(class_docs.values())
    preds = {}
    for doc_id, _lang, text in test:
        best = None
        for cls in sorted(class_docs):
            lnps = sorted(
                math.log((counts[cls][t] + 1) / (totals[cls] + v))
                for t in text.lower().split(" ")
            )
            score = 0.0
            for x in lnps:
                score += x
            score += math.log(class_docs[cls] / nd)
            if best is None or score > best[0]:
                best = (score, cls)
        preds[doc_id] = best[1]
    return preds


def test_nb_classify_matches_pure_python_reference(spark):
    """Exactness on the real corpus: every one of the 250 predictions
    must equal a from-scratch Python NB with the same smoothing, fold
    order, and tie-break — independent of whether the corpus labels are
    actually learnable (they are random w.r.t. the text here, so
    accuracy itself is ~prior; the MATH is what this pins)."""
    out = {r.doc_id: r for r in q_nb_classify(spark, SF).collect()}
    assert len(out) == 250  # odd doc_ids of 500
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    train = [(r.lang, r.text) for r in docs if r.doc_id % 2 == 0]
    test = [(r.doc_id, r.lang, r.text) for r in docs if r.doc_id % 2 == 1]
    expect = _python_nb(train, test)
    mismatches = {
        k: (out[k].pred_lang, expect[k])
        for k in expect
        if out[k].pred_lang != expect[k]
    }
    assert not mismatches, f"{len(mismatches)} diverge: {list(mismatches.items())[:5]}"
    truth = {d: l for d, l, _ in test}
    assert all(r.correct == int(r.pred_lang == truth[d]) for d, r in out.items())


def test_nb_classify_separable_fixture_is_perfect(spark):
    """On a vocabulary-separable fixture NB must reach 100% accuracy."""
    import os
    import tempfile

    import pandas as pd

    rows = []
    words = {"en": ["dog", "cat", "fish"], "fr": ["chien", "chat", "poisson"]}
    for i in range(40):
        lang = "en" if (i // 2) % 2 == 0 else "fr"
        w = words[lang]
        rows.append((i, f"{w[i % 3]} {w[(i + 1) % 3]} {w[i % 3]}", lang))
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    docs["source"] = "s"
    docs["n_chars"] = docs.text.str.len()
    with tempfile.TemporaryDirectory() as td:
        docs.to_parquet(os.path.join(td, "documents.parquet"))
        out = q_nb_classify(spark, td).collect()
    assert len(out) == 20
    assert all(r.correct == 1 for r in out)


def test_nb_oov_tokens_get_smoothed_mass(spark):
    """A test document made ENTIRELY of unseen tokens must still score
    finitely under every class (Laplace smoothing) and predict the class
    with the largest prior (all per-token OOV odds tie, modulo class
    totals) — never drop or null out."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 2, 4, 6, 1],
            "text": [
                "aa bb aa",
                "aa bb bb",
                "cc dd cc",
                "cc dd dd",
                "zz qq yy",  # test doc: fully OOV
            ],
            "lang": ["en", "en", "fr", "fr", "en"],
            "source": ["s"] * 5,
            "n_chars": [8] * 5,
        }
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs_path = os.path.join(td, "documents.parquet")
        docs.to_parquet(docs_path)
        # the query reads <sf_dir>/documents.parquet
        out = q_nb_classify(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 1
    # en and fr have equal priors and equal class token totals, so the
    # fully-OOV doc ties and the lexicographic tie-break picks 'en'
    assert r.pred_lang == "en"


def test_regression_multi_matches_numpy_lstsq(spark):
    got = {r.l_returnflag: r for r in q_regression_multi(spark, SF).collect()}
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        X = np.column_stack(
            [np.ones(len(grp)), grp.l_quantity.values, grp.l_discount.values]
        )
        y = grp.l_extendedprice.values
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        r = got[flag]
        assert r.n == len(grp)
        np.testing.assert_allclose(
            [r.b0, r.b_qty, r.b_disc], beta, rtol=1e-6,
            err_msg=f"flag {flag}",
        )
        pred = X @ beta
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        np.testing.assert_allclose(r.r2, 1 - ss_res / ss_tot, rtol=1e-6)
        assert 0.0 < r.r2 < 1.0


def test_regression_cv_matches_numpy_per_fold(spark):
    """Each fold's coefficients must equal numpy lstsq on the OTHER
    folds' rows, and the RMSE must equal the held-out residual RMS —
    verifying both the totals-minus-fold train statistics and the
    algebraic SSE expansion."""
    import hashlib

    from pyspark_excel_datasource_spark.operators.ml import q_regression_cv

    got = {r.fold: r for r in q_regression_cv(spark, SF).collect()}
    assert set(got) == {0, 1, 2, 3}
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
                "l_extendedprice")
        .toPandas()
    )
    li["fold"] = [
        int(hashlib.md5(f"{o}:{l}".encode()).hexdigest()[:15], 16) % 4
        for o, l in zip(li.l_orderkey, li.l_linenumber)
    ]
    for f in range(4):
        tr, te = li[li.fold != f], li[li.fold == f]
        X = np.column_stack([np.ones(len(tr)), tr.l_quantity, tr.l_discount])
        beta, *_ = np.linalg.lstsq(X, tr.l_extendedprice.values, rcond=None)
        r = got[f]
        assert (r.n_train, r.n_test) == (len(tr), len(te))
        np.testing.assert_allclose(  # coefficients ship as dround(6) decimals
            [float(r.b0), float(r.b_qty), float(r.b_disc)],
            beta,
            rtol=1e-6,
            atol=1e-5,
        )
        Xt = np.column_stack([np.ones(len(te)), te.l_quantity, te.l_discount])
        resid = te.l_extendedprice.values - Xt @ beta
        np.testing.assert_allclose(
            float(r.rmse), float(np.sqrt((resid ** 2).mean())),
            rtol=1e-6, atol=1e-4,  # rmse ships as dround(4) decimal
        )


def test_eval_confusion_matches_sklearnfree_reference(spark):
    """Precision/recall/F1 per class recomputed from the prediction set
    with independent code."""
    from pyspark_excel_datasource_spark.operators.ml import (
        q_eval_confusion,
        q_nb_classify,
    )

    preds = [(r.pred_lang, r.true_lang) for r in q_nb_classify(spark, SF).collect()]
    got = {r.cls: r for r in q_eval_confusion(spark, SF).collect()}
    classes = {t for _, t in preds}
    assert set(got) == classes
    for cls in classes:
        tp = sum(1 for p, t in preds if p == cls and t == cls)
        n_pred = sum(1 for p, _ in preds if p == cls)
        n_true = sum(1 for _, t in preds if t == cls)
        r = got[cls]
        assert (r.tp, r.n_pred, r.n_true) == (tp, n_pred, n_true)
        prec = tp / n_pred if n_pred else 0.0
        rec = tp / n_true
        assert r.precision == prec and r.recall == rec
        f1 = 0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
        np.testing.assert_allclose(r.f1, f1, rtol=1e-12)


def test_eval_auc_matches_pairwise_definition(spark):
    """AUC via the mid-rank statistic must equal the O(n^2) pairwise ROC
    definition P(score+ > score-) + 0.5 P(tie), computed independently
    on the collected scores."""
    from pyspark_excel_datasource_spark.operators.ml import nb_scores, q_eval_auc

    d = spark.read.parquet(f"{SF}/documents.parquet")
    scored = (
        nb_scores(d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1"))
        .filter("cls = 'en'")
        .select("true_lang", "score")
        .collect()
    )
    pos = [r.score for r in scored if r.true_lang == "en"]
    neg = [r.score for r in scored if r.true_lang != "en"]
    pairwise = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    expect = pairwise / (len(pos) * len(neg))
    row = q_eval_auc(spark, SF).collect()[0]
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    np.testing.assert_allclose(row.auc, expect, rtol=1e-12)
    assert 0.0 <= row.auc <= 1.0


def test_eval_auc_sampled_within_bound_and_deterministic(spark):
    """Sampled AUC: the exact side must equal q_eval_auc's number, the
    sample must be a genuine subset (~50%), the error must satisfy the
    in-plan 5-sigma bound, and the whole row must be run-to-run
    deterministic (content-addressed sample, no RNG)."""
    from pyspark_excel_datasource_spark.operators.ml import (
        q_eval_auc,
        q_eval_auc_sampled,
    )

    exact = q_eval_auc(spark, SF).collect()[0]
    row = q_eval_auc_sampled(spark, SF).collect()[0]
    np.testing.assert_allclose(row.auc_exact, exact.auc, rtol=0)
    assert 0 < row.n_pos < exact.n_pos or 0 < row.n_neg < exact.n_neg
    bound = 5.0 * (0.25 / row.n_pos + 0.25 / row.n_neg) ** 0.5
    assert row.abs_err <= bound
    assert bool(row.within_bound) is True
    again = q_eval_auc_sampled(spark, SF).collect()[0]
    assert again == row
