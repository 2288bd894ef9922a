"""F4 — reference-extraction regex dictionary (config-driven, at breadth).

The reference ships ~126 compiled citation patterns with a single-capture
contract (the capture is the numeric part of the citation) plus numeric
range guards applied post-match (Title <= 53, CFR Title <= 50), and counts
occurrences per normalized ``"<type> <number>"`` string:
  /root/reference/common/document_parser/ref_utils.py:31-1228 (make_dict),
  /root/reference/common/document_parser/lib/ref_list.py:10-86
  (look_for_general guards + ref_dict counting, preprocess_text).

This module re-expresses that contract Spark-first:

  * a declarative pattern TABLE (RefPattern rows) instead of imperative
    per-pattern extraction functions;
  * extraction is ONE narrow projection — every pattern's
    ``regexp_extract_all`` runs JVM-side in the same whole-stage-codegen
    pass over the preprocessed text, results concat/flatten/explode into
    (ref_type, num) rows; no Python touches the hot path;
  * guards become a vectorized boolean filter;
  * counting is an ordinary hash aggregate (map-side combined).

At 100 TB the cost is (patterns x bytes) of pure regex scanning per
executor — embarrassingly parallel, no shuffle until the final count. The
regex subset used is portable across Java (Spark) and RE2 (DuckDB oracle):
no backreferences or lookaround, ``(?i)`` inline flags, ``\\b`` boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The DoD-issuance number grammar shared by several families:
# optional letter prefix, 4 digits, dot, 1-3 digits, optional letter suffix.
_DODNUM = r"((?:[A-Z]+-)?[0-9]{4}\.[0-9]{1,3}[A-Z]?)"
# Army/Air-Force style dashed numbers.
_DASHNUM = r"([0-9]{1,3}-[0-9]{1,5}[A-Z]?)"


@dataclass(frozen=True)
class RefPattern:
    """One citation family. ``regex`` carries exactly ONE capture group —
    the citation's numeric part (the reference's single-capture contract).
    ``guard`` (lo, hi) keeps a match only when int(capture) is in range."""

    ref_type: str
    regex: str
    guard: tuple[int, int] | None = None


REF_PATTERNS: tuple[RefPattern, ...] = (
    # --- DoD issuances -------------------------------------------------
    RefPattern("DoD", r"(?i)\bdod\s?" + _DODNUM),
    RefPattern("DoDD", r"(?i)\b(?:dod\s?directives?|dodd)\s?" + _DODNUM),
    RefPattern("DoDI", r"(?i)\b(?:dod\s?instruction|dodi)\s?" + _DODNUM),
    RefPattern("DoDM", r"(?i)\b(?:dod\s?manual|dodm)\s?" + _DODNUM),
    RefPattern("DTM", r"(?i)\bdtm\s?-?\s?([0-9]{2}\s?-\s?[0-9]{3})"),
    RefPattern("AI", r"(?i)\badministrative\s?instruction\s?([0-9]{1,4})"),
    RefPattern("DoDFMR",
               r"(?i)\b(?:dod\s?fmr|dod\s?financial\s?management\s?regulation)"
               r",?\s?(?:volume|vol\.?)\s?([0-9]{1,3}[A-Z]?)"),
    # --- US Code / CFR / statute (guarded families) --------------------
    RefPattern("Title",
               r"(?i)\b([0-9]{1,3}),?\s(?:u\.?\s?s\.?\s?c\.?\b|united\sstates\scode)",
               guard=(1, 53)),
    RefPattern("Title",
               r"(?i)\b(?:u\.?\s?s\.?\s?c\.?|united\sstates\scode)(?:,?\s?title)?\s([0-9]{1,3})",
               guard=(1, 53)),
    RefPattern("CFR Title", r"(?i)\b([0-9]{1,3})\s?c\.?\s?f\.?\s?r\.?\b",
               guard=(1, 50)),
    RefPattern("EO", r"(?i)\b(?:executive\s?order|e\.?\s?o\.?)\s?([0-9]{5})"),
    RefPattern("PL", r"(?i)\b(?:public\s?law|p\.?\s?l\.?)\s?(?:no\.?\s?)?([0-9]{2,3}-[0-9]{1,4})"),
    # --- Intelligence community ----------------------------------------
    RefPattern("ICD", r"(?i)\b(?:intelligence\s?community\s?directive|icd)\s?([0-9]{1,3})"),
    RefPattern("ICPG", r"(?i)\bicpg\s?([0-9]{3}\.[0-9]{1,3})"),
    RefPattern("ICPM", r"(?i)\bicpm\s?([0-9]{4}-[0-9]{3}-[0-9])"),
    RefPattern("DCID", r"(?i)\bdcid\s?([0-9]/[0-9]{1,2}P?)"),
    # --- Joint staff -----------------------------------------------------
    RefPattern("CJCSI", r"(?i)\bcjcs\s?i(?:nstruction)?\s?([0-9]{4}\.[0-9]{1,3}[A-Z]?)"),
    RefPattern("CJCSM", r"(?i)\b(?:cjcs\s?manual|cjcsm)\s?([0-9]{4}\.[0-9]{1,3}[A-Z]?)"),
    RefPattern("CJCSN", r"(?i)\b(?:cjcs\s?notice|cjcsn)\s?([0-9]{4}[A-Z]?)"),
    RefPattern("CJCS GDE", r"(?i)\bcjcs\s?gde\s?([0-9]{4}[A-Z]?)"),
    RefPattern("JP", r"(?i)(?:joint\s?publication|\bj\.?\s?p\.?)\s?([0-9]{1,3}(?:[-.][0-9]{1,3}){0,3})"),
    # --- Army -----------------------------------------------------------
    RefPattern("AR", r"(?i)\b(?:ar|army\s?regulations?)\s?" + _DASHNUM),
    RefPattern("ADP", r"(?i)\badp\s?([0-9]{1,3}(?:-[0-9]{1,3})?)"),
    RefPattern("ATP", r"(?i)\batp\s?([0-9]{1,2}-[0-9]{1,3}(?:\.[0-9]{1,3})?)"),
    RefPattern("ATTP", r"(?i)\battp\s?([0-9]{1,2}-[0-9]{1,3}(?:\.[0-9]{1,3})?)"),
    RefPattern("PAM", r"(?i)\b(?:da\s?)?pam(?:phlet)?\s?" + _DASHNUM),
    RefPattern("FM", r"(?i)\b(?:fm|field\s?manual)\s?([0-9]{1,3}-[0-9]{1,3}(?:\.[0-9]{1,3})?)"),
    RefPattern("TC", r"(?i)\btc\s?([0-9]{1,2}-[0-9]{1,3}(?:\.[0-9]{1,3})?)"),
    RefPattern("TM", r"(?i)\btm\s?([0-9]{1,2}-[0-9]{3,5}(?:-[0-9]{1,4})*)"),
    RefPattern("TB", r"(?i)\btb\s?(?:med\s?)?([0-9]{1,4})"),
    RefPattern("STP", r"(?i)\bstp\s?([0-9]{1,2}-[0-9A-Z]{1,10}(?:-[A-Z]{2,4})?)"),
    RefPattern("GTA", r"(?i)\bgta\s?([0-9]{2}-[0-9]{2}-[0-9]{3})"),
    RefPattern("CTA", r"(?i)\bcta\s?([0-9]{2}-[0-9]{3})"),
    RefPattern("AGO", r"(?i)\bago\s?([0-9]{4}-[0-9]{2})"),
    RefPattern("HQDA", r"(?i)\bhqda\s?policy\s?notice\s?([0-9]{1,3}-[0-9]{1,3})"),
    # --- Air Force --------------------------------------------------------
    RefPattern("AFI", r"(?i)\bafi\s?" + _DASHNUM),
    RefPattern("AFMAN", r"(?i)\b(?:afman|af\s?manual)\s?" + _DASHNUM),
    RefPattern("AFPD", r"(?i)\bafpd\s?" + _DASHNUM),
    RefPattern("AFH", r"(?i)\baf\s?h(?:andbook)?\s?" + _DASHNUM),
    RefPattern("AFPAM", r"(?i)\bafpam\s?" + _DASHNUM),
    RefPattern("AFTTP", r"(?i)\bafttp\s?([0-9]{1,2}-[0-9]{1,3}(?:\.[0-9]{1,3})?)"),
    RefPattern("AFJI", r"(?i)\bafji\s?" + _DASHNUM),
    RefPattern("AFGM", r"(?i)\bafgm\s?([0-9]{4}-[0-9]{2}-[0-9]{2})"),
    RefPattern("DAFI", r"(?i)\bdafi\s?" + _DASHNUM),
    # --- Navy / Marine Corps ---------------------------------------------
    # Digits-only after MCO (no P): P-prefixed orders are their own family
    # ("MCO P", below) in the reference dictionary — allowing P here would
    # double-count every MCO P citation under both families.
    RefPattern("MCO",
               r"(?i)\b(?:mco|marine\s?corps\s?orders?)\s?"
               r"([0-9]{4,5}[A-Z]?\.[0-9]{1,3}[A-Z]?)"),
    RefPattern("MCBUL", r"(?i)\bmcbul\s?([0-9]{4,5})"),
    # Digit must follow NAVMC: "NAVMC DIR ..." belongs solely to the
    # "NAVMC DIR" family (below), mirroring the reference's split.
    RefPattern("NAVMC",
               r"(?i)\bnavmc\s?([0-9]{4}(?:\.[0-9]{1,3}[A-Z]?|\s?-\s?[A-Z])?)"),
    RefPattern("MCRP", r"(?i)\bmcrp\s?([0-9]{1,2}-[0-9]{1,3}[A-Z]?(?:\.[0-9]{1,3}[A-Z]?)?)"),
    RefPattern("MCTP", r"(?i)\bmctp\s?([0-9]{1,2}-[0-9]{2}[A-Z]?)"),
    RefPattern("MCWP", r"(?i)\bmcwp\s?([0-9]{1,2}-[0-9]{1,3}(?:\.[0-9]{1,3})?)"),
    RefPattern("MCDP", r"(?i)\bmcdp\s?([0-9]{1,2}(?:-[0-9]{1,2})?)"),
    RefPattern("SECNAVINST", r"(?i)\bsecnavinst\s?([0-9]{4}\.[0-9]{1,3}[A-Z]?)"),
    RefPattern("OPNAVINST", r"(?i)\bopnavinst\s?([0-9]{4}\.[0-9]{1,3}[A-Z]?)"),
    RefPattern("NAVSUP", r"(?i)\bnavsup\s?(?:pub(?:lication)?\s?)?([0-9]{3,5})"),
    # --- OMB / Coast Guard -------------------------------------------------
    RefPattern("OMBM", r"(?i)\bomb\s?m(?:emorandum)?\s?(M-[0-9]{2}-[0-9]{2})"),
    RefPattern("OMBC", r"(?i)\bomb\s?circular\s?(?:no\.?\s?)?(A-[0-9]{1,3})"),
    # "CI" is the reference's key for Commandant Instructions; the optional
    # M prefix is a deliberate superset (the reference's CI misses
    # M-prefixed instruction-manual citations like COMDTINST M5215.6).
    RefPattern("CI", r"(?i)\bcomdtinst\s?(M?[0-9]{3,6}(?:\.[0-9]{1,4}[A-Z]?)?)"),
    RefPattern("CIM", r"(?i)\bcim\s?([0-9]{4,5}\.[0-9]{1,3}[A-Z]?)"),
    RefPattern("COMDTPUB",
               r"(?i)\bcomdtpub\s([A-Z]?[0-9]{2,6}(?:\.[0-9]{1,3}[A-Z]?)?)"),
    RefPattern("CGTO",
               r"(?i)\bcgto\s((?:PG)?[- ]?(?:[0-9]{1,4}[A-Z]?-){1,3}[0-9]{0,4}[A-Z]?)"),
    RefPattern("CGTTP",
               r"(?i)\bcgttp\s?((?:[0-9]{1,2}-[0-9]{1,2}){1,3}(?:-[0-9]{1,2})?"
               r"[A-Z]?(?:\.[0-9]{1,2}[A-Z]?)?)"),
    RefPattern("DCMS",
               r"(?i)\b(?:deputy\s?commandant\s?for\s?mission\s?support|dcms),?\s?"
               r"(?:contingency\s?support\s?plan,?\s?)?([0-9]{2,6}-[0-9]{1,4})"),
    RefPattern("PSCINST", r"(?i)\bpscinst\s?([A-Z]?[0-9]{2,6}(?:\.?[0-9]{1,3})?)"),
    RefPattern("PSCNOTE", r"(?i)\bpscnote\s?([0-9]{1,6}(?:\.[0-9]{1,4})?)"),
    # --- Air Force (long tail) ------------------------------------------
    RefPattern("AF", r"(?i)\b(?:af|air\s?force)\s?(?:form\s?)?([0-9]{1,4}[A-Z]?)"),
    RefPattern("AFJMAN",
               r"(?i)\b(?:afjman|air\s?force\s?joint\s?manual)\s?"
               r"([0-9]{2}\s?-\s?[0-9]{3})"),
    RefPattern("AFJQS",
               r"(?i)\b(?:afjqs|air\s?force\s?job\s?qualification\s?standard)\s?"
               r"([0-9][0-9A-Z]{4}(?:\s?-\s?[0-9])?)"),
    RefPattern("AFM", r"(?i)\b(?:afm|air\s?force\s?manual)\s?([0-9]{2}\s?-\s?[0-9]{2})"),
    RefPattern("AFMD",
               r"(?i)\b(?:afmd|air\s?force\s?mission\s?directive)\s?([0-9]{1,2})"),
    RefPattern("AFPM",
               r"(?i)\b(?:afpm|air\s?force\s?policy\s?memorandum)\s?"
               r"([0-9]{4}\s?-\s?[0-9]{2}\s?-\s?[0-9]{2})"),
    RefPattern("AFVA",
               r"(?i)\b(?:afva|air\s?force\s?visual\s?aids?)\s?"
               r"([0-9]{1,2}\s?-\s?[0-9]{1,4})"),
    RefPattern("CFETP",
               r"(?i)\b(?:cfetp|career\s?field\s?education\s?(?:and|&)\s?"
               r"training\s?plan)\s?([A-Z0-9]*[0-9][A-Z0-9_-]+)"),
    RefPattern("DAFPD",
               r"(?i)\b(?:dafpd|department\s?of\s?the\s?air\s?force\s?policy\s?"
               r"directive)\s?([0-9]{2}\s?-\s?[0-9]{1,2})"),
    RefPattern("HAFMD",
               r"(?i)\b(?:hafmd|headquarters\s?air\s?force\s?mission\s?directive)\s?"
               r"([0-9]\s?-\s?[0-9]{1,2}(?:\s?addendum\s?[A-Z])?)"),
    RefPattern("HOI",
               r"(?i)\b(?:hoi|headquarters\s?operating\s?instruction)\s?"
               r"([0-9]{2}\s?-\s?[0-9]{1,2})"),
    RefPattern("QTP",
               r"(?i)\b(?:qtp|qualification\s?training\s?package)\s?"
               r"([0-9][0-9A-Z]{1,6}(?:\s?-\s?[0-9A-Z]{1,6}){0,2})"),
    RefPattern("JTA",
               r"(?i)\b(?:jta|joint\s?table\s?of\s?allowances?)\s?"
               r"([0-9]{2}\s?-\s?[0-9]{1,3})"),
    RefPattern("IRM",
               r"(?i)\b(?:irm|information\s?resource\s?management)\s?"
               r"((?:-\s?)?[0-9]{4}\s?-\s?[0-9]{2}[A-Z]?)"),
    RefPattern("SF", r"(?i)\bsf\s?([0-9]{2,4}(?:\s?-\s?[0-9])?[A-Z]?)"),
    # --- Army (long tail) -------------------------------------------------
    RefPattern("ARMY",
               r"(?i)\b(?:army\s?dir|army\s?directives?)\s?"
               r"(20[0-9]{2}\s?-\s?[0-9]{2}(?:\s?-\s?[0-9]{1,2})?)"),
    RefPattern("DA",
               r"(?i)\bda\s?memo(?:randums?)?\s?"
               r"([0-9]{1,3}\s?-\s?[0-9]{1,3}(?:\s?-\s?[0-9]{2})?)"),
    RefPattern("TRADOC Regulations (TRs)",
               r"(?i)\b(?:tr|tradoc\s?regulations?)\s?([0-9]{1,4}-[0-9]{1,4})\b"),
    RefPattern("CNGBI",
               r"(?i)\b(?:cngbi|chief\s?national\s?guard\s?bureau\s?instructions?)\s?"
               r"([0-9]{3,5}\.[0-9]{1,5}[A-Z]?(?:,?\s?vol(?:ume|\.)?\s?[0-9]{1,4})?)"),
    # --- Navy / Marine Corps (long tail) ---------------------------------
    RefPattern("ALNAV", r"(?i)\balnav\s?([0-9]{2,4}/[0-9]{2,4})\b"),
    RefPattern("BUMEDINST",
               r"(?i)\bbumedinst\s?([0-9]{3,6}(?:\.[0-9]{1,4}[A-Z]?)?)"),
    RefPattern("BUMEDNOTE",
               r"(?i)\b(?:bumed|bureau\s?of\s?medicine\s?and\s?surgery)\s?"
               r"not(?:e|ice)\s?([0-9]{2,6})"),
    RefPattern("BUPERSINST",
               r"(?i)\bbupersinst\s((?:bupersnote\s?)?[0-9]{1,6}"
               r"(?:\.[0-9]{1,4}[A-BD-UW-Z]?)?(?:\s?(?:ch|vol)\s?[0-9]{1,3})?)"),
    RefPattern("COMNAVRESFORCOMINST",
               r"(?i)\bcomnavresforcominst\s?([0-9]{3,6}(?:\.[0-9]{1,3}[A-Z]?)?"
               r"(?:\s?ch[ -]?[0-9]{1,2})?)\b"),
    RefPattern("FMFM",
               r"(?i)\b(?:fmfm|fleet\s?marine\s?force\s?manuals?)\s?"
               r"([0-9]\s?-\s?[0-9]{1,2}(?:\s?-\s?[0-9])?)"),
    RefPattern("FMFRP",
               r"(?i)\b(?:fmfrp|fleet\s?marine\s?force\s?reference\s?publication)\s?"
               r"([0-9]{1,2}\s?-\s?[0-9]{1,3}(?:\s?-\s?I+)?)"),
    RefPattern("JAGINST",
               r"(?i)\b(?:jaginst|jag\s?instruction)\s?"
               r"([0-9]{4,5}(?:\.[0-9]{1,2}[A-Z]?)?)"),
    RefPattern("MARADMIN", r"(?i)\bmaradmin\s([0-9]{1,4}[/-][0-9]{1,4})\b"),
    RefPattern("MCIP",
               r"(?i)\bmcip\s?([0-9]{1,2}\s?-\s?[0-9]{2}(?:[A-Z]{1,2})?"
               r"(?:\.?[0-9]{1,2}[A-Z]?)?)"),
    RefPattern("MCO P",
               r"(?i)\bmco[\s-]p[\s-]?([0-9]{2,6}[A-Z]?\.[0-9]{1,3}[A-Z]?)\b"),
    RefPattern("MILPERSMAN", r"(?i)\bmilpersman\s?([0-9]{2,5}-[0-9]{2,6})\b"),
    RefPattern("NAVADMIN", r"(?i)\bnavadmin\s?([0-9]{2,7}(?:/[0-9]{2,7})?)\b"),
    RefPattern("NAVAIR", r"(?i)\bnavair\s([0-9]{1,3}(?:-[0-9A-Z]{1,5}){0,4})"),
    RefPattern("NAVEDTRA",
               r"(?i)\bnavedtra\s([0-9][A-Z0-9]{0,6}(?:-[A-Z0-9]{1,6}){0,2})"),
    RefPattern("NAVMED",
               r"(?i)\b(?:navmed|navy\s?medicine)\s?"
               r"((?:P-)?[0-9]{1,4}(?:[/-][0-9]{1,4}){0,3})"),
    RefPattern("NAVSEA",
               r"(?i)\bnavsea\s((?:[A-Z]{1,2}[ -]?)?[0-9]{1,4}"
               r"(?:-[0-9A-Z]{1,6}){1,4}(?:\s?rev\s?[0-9]{1,2})?)"),
    RefPattern("NEHC Technical Manual",
               r"(?i)\b(?:nehc|navy\s?environmental\s?health\s?center)[ -]?"
               r"(?:technical\s?manual|t[ .]?m\.?)\s?"
               r"((?:[A-Z]{2}\s?)?[0-9]{2,5}(?:[.-][0-9A-Z]{1,5})*)"),
    RefPattern("NTTP",
               r"(?i)\bnttp\s?((?:[0-9]{1,2}-[0-9]{1,2}){1,3}(?:-[0-9]{1,2})?"
               r"[A-Z]?(?:\.[0-9]{1,2}[A-Z]?)?)"),
    RefPattern("OPNAVNOTE", r"(?i)\bopnav\s?note\s?([0-9]{3,6})\b"),
    RefPattern("RESPERSMAN",
               r"(?i)\b(?:respers|reserve\s?personnel)\s?m(?:an(?:ual)?)?[\s-]"
               r"([0-9]{3,5}(?:[.-][0-9]{1,4})?)"),
    RefPattern("SECNAV", r"(?i)\bsecnav\s?(M\s?-\s?[0-9]{4}\.[0-9]{1,2})"),
    RefPattern("NAVMC DIR",
               r"(?i)\b(?:navmc\s?dir|navmc\s?directive)\s?"
               r"([0-9]{4}\.[0-9]{1,3}[A-Z]?)"),
    # --- DHS / DHA ---------------------------------------------------------
    RefPattern("DHS Directive",
               r"(?i)\bdhs\s?directive(?:\s?no\.?)?\s?([0-9]{1,3}-[0-9]{1,3})"),
    RefPattern("HSPD",
               r"(?i)\b(?:hspd|homeland\s?security\s?presidential\s?directive)"
               r"[ -]?([0-9]{1,3})"),
    RefPattern("DHA Administrative Instructions",
               r"(?i)\bdha\sadministrative\sinstructions?\s"
               r"([0-9]{1,6}(?:\.[0-9]{1,4})?(?:,\schange\s[0-9]{1,3})?)"),
    RefPattern("DHA Procedural Instructions",
               r"(?i)\bdha\sprocedural\sinstructions?\s"
               r"([0-9]{1,6}(?:\.[0-9]{1,4})?)"),
    RefPattern("DHA Procedures Manuals",
               r"(?i)\bdha\sprocedures?\smanuals?\s([0-9]{1,6}(?:\.[0-9]{1,4})?"
               r"(?:,?\s?(?:vol|volumes?)[,.]?\s?[0-9]{1,3}(?:-[0-9]{1,3})?)?)"),
    RefPattern("DHA Technical Manuals",
               r"(?i)\bdha\stechnical\smanuals?\s([0-9]{1,6}(?:\.[0-9]{1,4})?"
               r"(?:,?\s?(?:vol|volumes?)[,.]?\s?[0-9]{1,3}(?:-[0-9]{1,3})?)?)"),
    # --- Acquisition regulations -------------------------------------------
    RefPattern("DFARS",
               r"(?i)\b(?:dfars|defense\sfederal\sacquisition\sregulation\s"
               r"supplement)\s?((?:(?:sub)?part|clauses?)?\s?[0-9]{1,5}"
               r"(?:[-.][0-9]{1,5}){0,3}|appendix\s?[A-Z])"),
    RefPattern("FAR",
               r"(?i)\b(?:far|federal\sacquisition\sregulation)\s?"
               r"((?:(?:sub)?part|clauses?)?\s?[0-9]{1,5}"
               r"(?:[-.][0-9]{1,5}){0,3}|appendix\s?[A-Z])"),
    RefPattern("PGI",
               r"(?i)\bpgi\s?(?:subpart\s?)?([0-9]{2,5}(?:[.-][0-9]{1,5}[A-Z]?\b)?)"),
    RefPattern("DCMA Instruction",
               r"(?i)\b(?:dcma|defense\scontract\smanagement\sagency)[\s-]?"
               r"inst(?:ruction)?\s?([0-9]{3,5}(?:\.[0-9]{1,3}[A-Z]?)?)\b"),
    RefPattern("DCMA Manual",
               r"(?i)\bdcma[\s-]?man(?:ual)?[\s-]?([0-9]{2,6}(?:-[0-9]{2,6})?)"),
    # --- Congressional measures ---------------------------------------------
    RefPattern("H.R.", r"(?i)\bh\s?\.?\s?r\.?\s?([0-9]{1,6})\b"),
    RefPattern("H.J.Res.",
               r"(?i)\bh\s?[,.]?\s?j\s?[,.]?\s?res\.?\s?([0-9]{1,4})"),
    RefPattern("S. Res.",
               r"(?i)\bs\s?\.?\s?res\s?\.?\s?(?:no\.?\s?)?([0-9]{1,5})"),
    RefPattern("S.Con.Res.", r"(?i)\bs\.?\s?con\.?\s?res\.?\s?([0-9]{1,3})"),
    # --- NATO / standards / misc ---------------------------------------------
    RefPattern("AMedP",
               r"(?i)\b(?:amedp|allied\smedical\spublications?)\]?[-\s]?"
               r"([0-9]{1,3}(?:\[[A-Z]\]|[A-Z])?(?:\.[0-9]{1,3}[A-Z]?)?"
               r"(?:,?\s?edition\s?[A-Z]{1,2},?)?(?:\s?version\s?[0-9]{1,2})?)"),
    RefPattern("STANAG", r"(?i)\bstanag\s?([0-9]{3,6})\b"),
    RefPattern("NFPA",
               r"(?i)\b(?:nfpa|national\s?fire\s?protection\s?association)\s?"
               r"([0-9]{1,5})"),
    RefPattern("MIL-STD",
               r"(?i)mil(?:itary)?\s?-?\s?(?:standard|std)\s?-?([0-9]{1,5}[A-Z]?)"),
    RefPattern("SFFAS",
               r"(?i)\b(?:sffas|statement\sof\sfederal\sfinancial\saccounting\s"
               r"standards?)\s?(?:no\.?\s?)?([0-9]{1,3})\b"),
)


def preprocess_refs_expr(col: Column | str) -> Column:
    """The reference's preprocess_text (ref_utils.py:8-28) as one native
    expression: en-dash -> '-', strip parentheses, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, "–", "-")
    c = F.regexp_replace(c, r"[()]", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


PREPROCESS_SQL = (
    "trim(regexp_replace(regexp_replace(replace({col}, chr(8211), '-'), "
    "'[()]', '', 'g'), '\\s+', ' ', 'g'))"
)


def extract_refs(
    df: DataFrame, text_col: str = "text",
    patterns: tuple[RefPattern, ...] = REF_PATTERNS,
) -> DataFrame:
    """(ref_type, num, ref) rows for every citation match in ``text_col``.

    One projection: all patterns' regexp_extract_all over the SAME
    preprocessed text, wrapped into (type, num) structs, concatenated,
    flattened, exploded. Guards applied as a vectorized filter after the
    explode. Whole plan is JVM codegen — no UDFs.
    """
    pre = preprocess_refs_expr(text_col)

    # closure FACTORY, not a default-arg lambda: pyspark passes the array
    # index as a second lambda argument when the signature has two params,
    # which would silently override a default.
    def _tag(ref_type: str):
        return lambda x: F.struct(F.lit(ref_type).alias("ref_type"), x.alias("num"))

    arrays = []
    for p in patterns:
        caps = F.regexp_extract_all(pre, F.lit(p.regex), 1)
        arrays.append(F.transform(caps, _tag(p.ref_type)))
    refs = df.select(F.explode(F.flatten(F.array(*arrays))).alias("r")).select(
        F.col("r.ref_type").alias("ref_type"), F.trim(F.col("r.num")).alias("num")
    )
    cond = F.lit(True)
    for p in patterns:
        if p.guard is not None:
            lo, hi = p.guard
            cond = cond & (
                F.when(
                    F.col("ref_type") == p.ref_type,
                    F.col("num").cast("int").between(lo, hi),
                ).otherwise(F.lit(True))
            )
    return refs.filter(cond).withColumn(
        "ref", F.concat_ws(" ", F.col("ref_type"), F.col("num"))
    )


def count_refs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ref -> occurrence count (the reference's ref_dict counting,
    ref_list.py:58-80), as a map-side-combined hash aggregate."""
    return (
        extract_refs(df, text_col)
        .groupBy("ref")
        .agg(F.count("*").alias("n"))
    )


def refs_oracle_sql(
    source: str, text_expr: str = "text",
    patterns: tuple[RefPattern, ...] = REF_PATTERNS,
) -> str:
    """DuckDB mirror of count_refs: one UNION ALL branch per pattern over
    the same preprocessed text, guards as WHERE clauses. Patterns are the
    Java/RE2-portable subset, so the strings are shared verbatim."""
    pre = PREPROCESS_SQL.format(col=text_expr)
    branches = []
    for p in patterns:
        rx = p.regex.replace("'", "''")
        guard = ""
        if p.guard is not None:
            guard = (
                f" WHERE TRY_CAST(trim(num) AS INT) BETWEEN {p.guard[0]} AND {p.guard[1]}"
            )
        branches.append(
            f"SELECT '{p.ref_type}' AS ref_type, num FROM ("
            f"SELECT unnest(regexp_extract_all(t, '{rx}', 1)) AS num FROM pre){guard}"
        )
    union = "\nUNION ALL\n".join(branches)
    return f"""
WITH pre AS (SELECT {pre} AS t FROM {source}),
refs AS (
{union}
)
SELECT ref_type || ' ' || trim(num) AS ref, CAST(count(*) AS BIGINT) AS n
FROM refs GROUP BY 1
"""
