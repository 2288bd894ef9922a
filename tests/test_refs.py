"""F4 citation dictionary — unit cases modeled on the reference's pattern /
guard behavior (ref_utils.py make_dict + ref_list.py look_for_general)."""

import pytest

from gamechanger_data_spark.functions.refs import (
    REF_PATTERNS,
    count_refs,
    extract_refs,
)


def _refs(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(text,)], "text string")
    return sorted(r["ref"] for r in extract_refs(df).collect())


def test_single_capture_contract():
    """Every pattern carries exactly one capture group (the reference's
    look_for_general contract, ref_list.py:27-39)."""
    import re

    for p in REF_PATTERNS:
        n_groups = re.compile(p.regex).groups
        assert n_groups == 1, f"{p.ref_type}: {n_groups} capture groups"


def test_dod_issuance_family(spark):
    got = _refs(spark, "per DoD Directive 5000.01 and DoDI 8500.01, "
                       "see also DoD Manual 5200.01 and DTM 17-007")
    assert "DoDD 5000.01" in got
    assert "DoDI 8500.01" in got
    assert "DoDM 5200.01" in got
    assert "DTM 17-007" in got


def test_title_guard_bounds(spark):
    # reference rule: Title kept only for 1..53 (ref_list.py:41-48)
    assert _refs(spark, "10 U.S.C. applies") == ["Title 10"]
    assert _refs(spark, "Title 53, U.S.C.") == ["Title 53"]
    assert _refs(spark, "Title 54, U.S.C.") == []
    assert _refs(spark, "Title 0, United States Code") == []


def test_cfr_guard_bounds(spark):
    assert _refs(spark, "under 32 CFR part 310") == ["CFR Title 32"]
    assert _refs(spark, "under 51 CFR") == []


def test_preprocess_parens_and_dash(spark):
    # reference preprocess_text removes parens and maps en dash to '-'
    assert "EO 13526" in _refs(spark, "(Executive Order 13526)")
    got = _refs(spark, "DTM 17–007")  # en dash inside the number
    assert "DTM 17-007" in got


def test_whitespace_normalization(spark):
    got = _refs(spark, "CJCSI   3170.01H\nand JP  3-0")
    assert "CJCSI 3170.01H" in got
    assert "JP 3-0" in got


def test_counting_multiple_occurrences(spark):
    df = spark.createDataFrame(
        [("ICD 203 cites ICD 203 and ICD 731",), ("MCO 5215.1K",)],
        "text string",
    )
    counts = {r["ref"]: r["n"] for r in count_refs(df).collect()}
    assert counts["ICD 203"] == 2
    assert counts["ICD 731"] == 1
    assert counts["MCO 5215.1K"] == 1


def test_service_families(spark):
    got = _refs(
        spark,
        "AFI 36-2903, AR 25-2, SECNAVINST 5210.8, OPNAVINST 3100.6J, "
        "OMB Memorandum M-19-21, OMB Circular A-130, Public Law 115-232, "
        "COMDTINST M5215.6, FM 3-0, MCWP 3-11.2",
    )
    for want in [
        "AFI 36-2903", "AR 25-2", "SECNAVINST 5210.8", "OPNAVINST 3100.6J",
        "OMBM M-19-21", "OMBC A-130", "PL 115-232", "CI M5215.6",
        "FM 3-0", "MCWP 3-11.2",
    ]:
        assert want in got, f"missing {want} in {got}"


def test_plan_is_udf_free(spark):
    """The extraction plan must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes)."""
    import contextlib
    import io

    df = spark.createDataFrame([("10 U.S.C.",)], "text string")
    out = extract_refs(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan


def test_long_tail_families(spark):
    """Round-3 long tail: one representative citation per newly-added
    family group (formats from ref_utils.py's public numbering grammars)."""
    got = _refs(
        spark,
        "AFJMAN 23-210, AFPM 2020-36-01, CFETP 3E5X1, DAFPD 10-9, "
        "HAFMD 1-24, HOI 33-3, QTP 4B051-1, JTA 50-900, SF 86, "
        "Army Directive 2020-06, DA Memo 25-52, TRADOC Regulation 10-5, "
        "CNGBI 1000.01A, ALNAV 042/20, BUMEDINST 6010.13, "
        "BUPERSINST 1430.16F, MARADMIN 045/21, MCO P1020.34G, "
        "MILPERSMAN 1300-306, NAVADMIN 123/20, NAVAIR 00-80T-105, "
        "NAVSEA OP 5-1, NTTP 3-07.2, OPNAVNOTE 5450, SECNAV M-5210.1, "
        "NAVMC DIR 5100.8, DHS Directive 140-01, HSPD-12, "
        "DHA Procedural Instructions 6025.13, DFARS 225.7002, FAR Part 15, "
        "PGI 204.7103, DCMA Manual 2501-01, H.R. 5515, H.J.Res. 31, "
        "S. Res. 70, S.Con.Res. 14, AMedP 8.1, STANAG 2116, NFPA 1500, "
        "MIL-STD-810G, SFFAS 4, COMDTPUB P16700.4, CGTTP 3-32.1, "
        "PSCNOTE 1401, DCMS 5200-1",
    )
    for want in [
        "AFJMAN 23-210", "AFPM 2020-36-01", "CFETP 3E5X1", "DAFPD 10-9",
        "HAFMD 1-24", "HOI 33-3", "QTP 4B051-1", "JTA 50-900", "SF 86",
        "ARMY 2020-06", "DA 25-52", "TRADOC Regulations (TRs) 10-5",
        "CNGBI 1000.01A", "ALNAV 042/20", "BUMEDINST 6010.13",
        "BUPERSINST 1430.16F", "MARADMIN 045/21", "MCO P 1020.34G",
        "MILPERSMAN 1300-306", "NAVADMIN 123/20", "NAVAIR 00-80T-105",
        "NTTP 3-07.2", "OPNAVNOTE 5450", "SECNAV M-5210.1",
        "NAVMC DIR 5100.8", "DHS Directive 140-01", "HSPD 12",
        "DHA Procedural Instructions 6025.13", "DFARS 225.7002",
        "FAR Part 15", "PGI 204.7103", "DCMA Manual 2501-01", "H.R. 5515",
        "H.J.Res. 31", "S. Res. 70", "S.Con.Res. 14", "AMedP 8.1",
        "STANAG 2116", "NFPA 1500", "MIL-STD 810G", "SFFAS 4",
        "COMDTPUB P16700.4", "CGTTP 3-32.1", "PSCNOTE 1401", "DCMS 5200-1",
    ]:
        assert want in got, f"missing {want}"


def test_one_family_per_citation(spark):
    """A citation matches exactly ONE family, as in the reference dict:
    MCO never swallows MCO P's P-prefix, NAVMC never swallows DIR
    (ref_utils.py:320-352 keeps those grammars disjoint)."""
    got = _refs(spark, "per MCO P1020.34G and NAVMC DIR 5100.8, "
                       "see MCO 5215.1K and NAVMC 2915")
    assert got.count("MCO P 1020.34G") == 1
    assert got.count("NAVMC DIR 5100.8") == 1
    assert got.count("MCO 5215.1K") == 1
    assert got.count("NAVMC 2915") == 1
    for spurious in ("MCO P1020.34G", "MCO 1020.34G",
                     "NAVMC 5100.8", "NAVMC 5100"):
        assert spurious not in got, f"double-matched: {spurious}"


def test_full_family_coverage_vs_reference():
    """Every family key the reference's make_dict registers has a pattern
    here (ref_utils.py:31-1228; 125 unique keys)."""
    ours = {p.ref_type for p in REF_PATTERNS}
    assert len(ours) >= 125
