"""keyword_extract: broadcast and distributed-join paths must agree exactly;
edge cases (short/empty/null docs) yield no rows, not errors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus():
    rows = []
    for i in range(60):
        body = f"主题{i % 7}内容" * (3 + i % 4) + "共享样板文本页脚"
        rows.append({"doc_id": i, "text": body})
    rows += [
        {"doc_id": 100, "text": "abc"},   # shorter than k=4: no grams
        {"doc_id": 101, "text": ""},      # empty
        {"doc_id": 102, "text": None},    # null
    ]
    return rows


def _canon(df):
    df = df[["doc_id", "g", "tf", "df", "rnk"]].copy()
    for c in ("doc_id", "tf", "df", "rnk"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["doc_id", "rnk"]).reset_index(drop=True)


def test_paths_agree_and_match_local_reference():
    import collections

    import ray.data

    from chinese_corpus_cleaning_ray.stages.analysis import keyword_extract

    rows = _corpus()
    ds = ray.data.from_items(rows).repartition(5)
    broad = _canon(keyword_extract(ds, k=4, top=3).to_pandas())
    dist = _canon(keyword_extract(ds, k=4, top=3,
                                  df_broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(broad, dist)

    # driver-side reference
    tf = collections.defaultdict(collections.Counter)
    for r in rows:
        t = r["text"] or ""
        for j in range(len(t) - 3):
            tf[r["doc_id"]][t[j:j + 4]] += 1
    dfc = collections.Counter()
    for cid, c in tf.items():
        for g in c:
            dfc[g] += 1
    exp = []
    for cid, c in tf.items():
        ranked = sorted(((-n, dfc[g], g) for g, n in c.items()))[:3]
        for rnk, (nn, d, g) in enumerate(ranked, 1):
            exp.append({"doc_id": cid, "g": g, "tf": -nn, "df": d, "rnk": rnk})
    exp = _canon(pd.DataFrame(exp))
    pd.testing.assert_frame_equal(broad, exp)

    # gram-less docs produce no rows
    assert not set(broad["doc_id"]) & {100, 101, 102}

    # tfidf column present and consistent with ln(N/df)
    full = keyword_extract(ds, k=4, top=3).to_pandas()
    n_docs = len(rows)
    want = full["tf"].to_numpy(float) * np.log(n_docs / full["df"].to_numpy(float))
    assert np.allclose(full["tfidf"].to_numpy(), want)


def test_rare_term_beats_boilerplate():
    import ray.data

    from chinese_corpus_cleaning_ray.stages.analysis import keyword_extract

    rows = [{"doc_id": i, "text": "样板页脚文本一致"} for i in range(9)]
    rows.append({"doc_id": 9, "text": "样板页脚文本一致 稀有关键词 稀有关键词"})
    ds = ray.data.from_items(rows)
    out = keyword_extract(ds, k=4, top=1).to_pandas()
    row9 = out[out["doc_id"] == 9].iloc[0]
    assert "稀有" in row9["g"] or row9["df"] == 1  # rare gram wins rank 1
    assert row9["tf"] == 2
