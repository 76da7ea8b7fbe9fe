"""k-anonymity audit (pyfads.primitives.kanon_audit): planted-violation
detection plus the real property — the flagship FADS release has zero
violating boxes at fixture scale."""

from __future__ import annotations

from pyfads.primitives import kanon_audit

from tests.conftest import SF_DIR


def test_planted_violation_is_flagged(spark):
    rows = [
        # box A: 3 distinct pids -> violates k=5
        (1, 0, 10, 0.0, 1.0), (2, 0, 10, 0.0, 1.0), (3, 0, 10, 0.0, 1.0),
        # box B: 5 distinct pids -> ok (one pid duplicated: n_rows 6, n_pids 5)
        (4, 20, 30, 2.0, 3.0), (5, 20, 30, 2.0, 3.0), (6, 20, 30, 2.0, 3.0),
        (7, 20, 30, 2.0, 3.0), (8, 20, 30, 2.0, 3.0), (8, 20, 30, 2.0, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "pid bigint, q_lo bigint, q_hi bigint, v_lo double, v_hi double"
    )
    out = {
        (r.q_lo, r.q_hi): r
        for r in kanon_audit(df, ["q", "v"], "pid", k=5).collect()
    }
    assert out[(0, 10)].violates_k and out[(0, 10)].n_pids == 3
    assert not out[(20, 30)].violates_k
    assert (out[(20, 30)].n_rows, out[(20, 30)].n_pids) == (6, 5)


def test_flagship_release_has_no_violations(spark):
    import __spark_entry__ as entry

    audit = entry.queries()["kanon_audit_events"](spark, SF_DIR)
    assert audit.filter("violates_k").count() == 0


def test_ldiversity_homogeneity_attack_flagged(spark):
    from pyfads.primitives import ldiversity_audit

    rows = [
        # box A: 5 pids but ONE sensitive value -> homogeneity attack
        (1, 0, 10, "flu"), (2, 0, 10, "flu"), (3, 0, 10, "flu"),
        (4, 0, 10, "flu"), (5, 0, 10, "flu"),
        # box B: 2 sensitive values -> ok at l=2
        (6, 20, 30, "flu"), (7, 20, 30, "cold"),
    ]
    df = spark.createDataFrame(rows, "pid bigint, q_lo bigint, q_hi bigint, dx string")
    out = {(r.q_lo, r.q_hi): r
           for r in ldiversity_audit(df, ["q"], "dx", l=2).collect()}
    assert out[(0, 10)].violates_l and out[(0, 10)].n_sensitive == 1
    assert not out[(20, 30)].violates_l


def test_flagship_release_ldiversity_report_runs(spark):
    import __spark_entry__ as entry

    audit = entry.queries()["ldiv_audit_events"](spark, SF_DIR).collect()
    assert len(audit) > 0
    # the report is the operator; the fixture happens to be 2-diverse
    assert all(r.n_sensitive >= 1 for r in audit)


def test_tcloseness_skew_attack_flagged(spark):
    from pyfads.primitives import tcloseness_audit

    rows = (
        # box A: 10 rows, 9 "flu" 1 "cold" vs global 50/50 -> TVD = 0.4
        [(i, 0, 10, "flu") for i in range(9)] + [(9, 0, 10, "cold")]
        # box B: 10 rows, 1 "flu" 9 "cold" (keeps global balanced)
        + [(10 + i, 20, 30, "cold") for i in range(9)] + [(19, 20, 30, "flu")]
    )
    df = spark.createDataFrame(rows, "pid bigint, q_lo bigint, q_hi bigint, dx string")
    # t = 3/8 = 0.375 < 0.4: both skewed boxes violate
    out = tcloseness_audit(df, ["q"], "dx", t_num=3, t_den=8).collect()
    assert all(r.violates_t for r in out)
    # t = 1/2 = 0.5 > 0.4: neither does
    out2 = tcloseness_audit(df, ["q"], "dx", t_num=1, t_den=2).collect()
    assert not any(r.violates_t for r in out2)
    # exact integer distance: sum_v |c_v*N - N_v*n| = |9*20-10*10| + |1*20-10*10| = 160
    assert all(r.tv_scaled == 160 for r in out)


def test_tcloseness_uniform_box_passes(spark):
    from pyfads.primitives import tcloseness_audit

    rows = [(i, 0, 10, "flu" if i % 2 else "cold") for i in range(10)]
    rows += [(10 + i, 20, 30, "flu" if i % 2 else "cold") for i in range(10)]
    df = spark.createDataFrame(rows, "pid bigint, q_lo bigint, q_hi bigint, dx string")
    out = tcloseness_audit(df, ["q"], "dx", t_num=1, t_den=100).collect()
    assert all(r.tv_scaled == 0 and not r.violates_t for r in out)
