"""Corpus mixing: token-budget mixture selection (greedy cut, allowlist,
determinism) and domain-level quality gates (support floor, anti-join
application, broadcast plan)."""

from pyspark.sql import functions as F

from ocr_spark.operators.mixing import (
    apply_domain_blocklist,
    domain_blocklist,
    token_budget_select,
    token_budget_select_scalable,
)


def _doc(i, lang, words, word="tok"):
    # distinct-enough words keep quality_score from degenerating
    return (i, lang, " ".join(f"{word}{i}x{j}" for j in range(words)))


def test_token_budget_greedy_cut(spark):
    # en budget 25 tokens; docs of 10 tokens each -> exactly 2 selected,
    # the 3rd crosses the budget, the 4th stays unselected too (greedy
    # running-sum semantics, not knapsack).
    rows = [_doc(i, "en", 10) for i in range(4)]
    out = token_budget_select(
        spark.createDataFrame(rows, "doc_id long, lang string, text string"),
        {"en": 25},
    ).collect()
    sel = {r["doc_id"]: r for r in out}
    assert len(out) == 4
    assert sum(r["selected"] for r in out) == 2
    # ledger is auditable: cum_tokens strictly increases along the ranking
    ranked = sorted(out, key=lambda r: r["cum_tokens"])
    assert [r["cum_tokens"] for r in ranked] == [10, 20, 30, 40]
    assert all(sel[r["doc_id"]]["n_tokens"] == 10 for r in out)


def test_token_budget_lang_allowlist(spark):
    rows = [_doc(0, "en", 5), _doc(1, "zz", 5)]
    out = token_budget_select(
        spark.createDataFrame(rows, "doc_id long, lang string, text string"),
        {"en": 100},
    ).collect()
    # zz has no budget -> excluded entirely, not just unselected
    assert {r["lang"] for r in out} == {"en"}


def test_token_budget_quality_ordering(spark):
    # same token count, different quality: doc 1 sits in the good length
    # band and carries stopwords (quality 1.0); doc 0 is short with none
    # (quality 0.5). The budget fits one doc -> the better one wins even
    # though doc 0 sorts first by id.
    rows = [
        (0, "en", " ".join(f"w{j}" for j in range(12))),
        (1, "en", "the quick brown foxhound vaulted over the sleepy "
                  "gardener and trotted away down the long gravel lane"),
    ]
    out = {
        r["doc_id"]: r
        for r in token_budget_select(
            spark.createDataFrame(rows, "doc_id long, lang string, text string"),
            {"en": 17},  # fits doc 1 (17 tokens) alone; doc 0 would also fit
        ).collect()
    }
    assert out[1]["selected"] and not out[0]["selected"]
    assert out[1]["quality"] > out[0]["quality"]


def _host_rows():
    rows = []
    # goodhost: 6 docs, all pass quality_filter (30 distinct words)
    for i in range(6):
        rows.append((i, f"https://goodhost.com/p{i}",
                     " ".join(f"w{i}x{j}" for j in range(30))))
    # badhost: 6 docs, 5 fail (too_short), 1 passes -> kept_frac ~0.17
    for i in range(6, 11):
        rows.append((i, f"https://badhost.com/p{i}", "tiny page"))
    rows.append((11, "https://badhost.com/ok",
                 " ".join(f"v{j}" for j in range(30))))
    # smallhost: 2 docs, both fail — below the support floor, never blocked
    rows.append((12, "https://smallhost.com/a", "x"))
    rows.append((13, "https://smallhost.com/b", "y"))
    return rows


def test_domain_blocklist_support_floor(spark):
    df = spark.createDataFrame(_host_rows(), "doc_id long, url string, text string")
    bl = {r["host"]: r for r in domain_blocklist(df, min_docs=5,
                                                 min_kept_frac=0.5).collect()}
    assert not bl["goodhost.com"]["blocked"] and bl["goodhost.com"]["kept_frac"] == 1.0
    assert bl["badhost.com"]["blocked"] and bl["badhost.com"]["n_docs"] == 6
    # two failing docs but under min_docs -> spared
    assert not bl["smallhost.com"]["blocked"] and bl["smallhost.com"]["kept_frac"] == 0.0


def test_apply_domain_blocklist_anti_join(spark):
    df = spark.createDataFrame(_host_rows(), "doc_id long, url string, text string")
    bl = domain_blocklist(df, min_docs=5, min_kept_frac=0.5)
    kept = apply_domain_blocklist(df, bl)
    hosts = {r[0] for r in kept.select(
        F.regexp_extract("url", r"://([^/]+)", 1)).distinct().collect()}
    # the whole bad host vanishes, including its one passing page
    assert hosts == {"goodhost.com", "smallhost.com"}
    assert kept.count() == 8
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_scalable_select_equals_windowed(spark):
    # mixed langs, repeated quality classes, ties on tokens — the scalable
    # range-cumsum must reproduce the windowed ledger row for row
    rows = []
    i = 0
    for lang in ("en", "de", "fr"):
        for w in (4, 9, 14, 30, 3, 9):
            rows.append(_doc(i, lang, w, word=f"{lang}t"))
            i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).repartition(7)
    budgets = {"en": 40, "de": 25, "fr": 1}
    base = {
        r["doc_id"]: tuple(r)
        for r in token_budget_select(df, budgets).collect()
    }
    scal = {
        r["doc_id"]: tuple(r)
        for r in token_budget_select_scalable(
            df, budgets, num_partitions=5
        ).collect()
    }
    assert base == scal


def test_scalable_select_plan_has_no_per_lang_partitioning(spark):
    df = spark.createDataFrame(
        [_doc(i, "en" if i % 2 else "de", 6) for i in range(20)],
        "doc_id long, lang string, text string",
    )
    out = token_budget_select_scalable(df, {"en": 50, "de": 50},
                                       num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the ordering shuffle is a range partitioning over (lang, quality, id),
    # never a hash partitioning on lang alone (the one-task-per-language
    # straggler) and never a single partition
    assert "rangepartitioning" in plan
    assert "hashpartitioning(lang" not in plan
    assert "SinglePartition" not in plan


def test_token_budget_plan_single_lang_shuffle(spark):
    # budgets broadcast; the only exchange is the lang hash partitioning
    # feeding the window — no SinglePartition anywhere.
    df = spark.createDataFrame(
        [_doc(i, "en", 8) for i in range(10)],
        "doc_id long, lang string, text string",
    )
    out = token_budget_select(df, {"en": 50})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan


def test_domain_quality_eb_shrinks_small_hosts(spark):
    """A 2-page all-bad host must NOT be blocked (posterior near the
    prior), while a 40-page all-bad host must be — the evidence-scaled
    behavior the support floor cannot express; a large good host stays
    unblocked with smoothed ~ own rate."""
    from ocr_spark.operators.mixing import domain_quality_eb

    good = ("this is a perfectly reasonable document with plenty of real "
            "words and normal sentences that passes the quality gate "
            "because it looks like ordinary prose text written by people. "
            ) * 3
    rows = []
    # big good host: 80 pages of prose (prior g ~ 0.66, above threshold)
    rows += [(i, f"https://good.com/p{i}", good) for i in range(80)]
    # big bad host: 40 junk pages
    rows += [(100 + i, f"https://bad.com/p{i}", "x x") for i in range(40)]
    # tiny bad host: 2 junk pages — floor-exempt in domain_blocklist,
    # prior-shrunk (not blocked) here
    rows += [(200 + i, f"https://tinybad.com/p{i}", "y y") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r.host: r for r in
           domain_quality_eb(df, prior_strength=20.0,
                             min_smoothed_frac=0.5).collect()}
    assert not out["good.com"].blocked
    assert out["good.com"].smoothed_frac > 0.8
    assert out["bad.com"].blocked            # 40 bad pages beat the prior
    assert not out["tinybad.com"].blocked    # 2 pages shrink to the prior
    assert out["tinybad.com"].kept_frac == 0.0
    assert out["tinybad.com"].smoothed_frac > 0.4
