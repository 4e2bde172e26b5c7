"""Deterministic FEC-shaped fixture (FIXTURES.md §A) + an independent
pandas oracle that follows the reference scripts' documented semantics.

The fixture exercises every edge the reference handles:
- H-office rows (filtered), year variants ('16', '2016.0', '2014'),
- duplicate CAND_IDs with differing CAND_PCC/CAND_STATUS (spine dedup),
- a committee linked to two candidates with CMTE_DSGN P vs A
  (prefer-principal), a committee linked to no valid candidate,
- junk amounts ('N/A', negatives, '0'), excluded TP/ENTITY values,
- ORG_TP in {C, '', L, None} (null -> '' fill; 'L' excluded from both
  PAC buckets), a malformed extra-field line (DROPMALFORMED).
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd

YEAR = "2016"


def _rows_cn():
    # CAND_ID, NAME, PTY, ELECTION_YR, ST, OFFICE, DIST, ICI, STATUS, PCC + 5 filler
    rows = [
        ["S1AA00001", "ALPHA, A", "DEM", "2016", "AA", "S", "00", "I", "C", "C00000001"],
        ["S1AA00002", "BRAVO, B", "REP", "2016.0", "AA", "S", "00", "C", "F", ""],  # year needs regex
        ["S1BB00003", "CHARLIE, C", "LIB", "2016", "BB", "S", "00", "O", "", ""],  # zero support
        ["P1XX00004", "DELTA, D", "DEM", "2016", "", "P", "00", "I", "C", "C00000004"],
        ["P1XX00005", "ECHO, E", "REP", "2016", "", "P", "00", "C", "N", ""],
        ["H1CC00006", "HOTEL, H", "DEM", "2016", "CC", "H", "01", "I", "C", "C00000006"],  # office filtered
        ["S1DD00007", "GOLF, G", "REP", "2014", "DD", "S", "00", "I", "C", ""],  # year filtered
        # duplicate CAND_ID group: first row lacks PCC, second has PCC (wins), third status C no pcc
        ["S1EE00008", "DUP, NOPCC", "DEM", "2016", "EE", "S", "00", "I", "N", ""],
        ["S1EE00008", "DUP, PCC", "DEM", "2016", "EE", "S", "00", "I", "N", "C00000008"],
        ["S1EE00008", "DUP, STATC", "DEM", "16", "EE", "S", "00", "I", "C", ""],  # '16' year -> filtered
    ]
    return [r + ["st1", "st2", "city", r[4] or "XX", "00000"] for r in rows]


def _rows_cm():
    # CMTE_ID, NM, TRES, ST1, ST2, CITY, ST, ZIP, DSGN, TP, PTY, FREQ, ORG_TP, CONN, CAND_ID
    def cm(cmte, dsgn, tp, org):
        return [cmte, f"CMTE {cmte}", "T", "s1", "s2", "city", "AA", "0", dsgn, tp, "", "Q", org, "", ""]

    return [
        cm("C00000101", "P", "Q", "C"),      # corp PAC
        cm("C00000102", "U", "N", None),     # nonconnected PAC (null ORG_TP -> '')
        cm("C00000103", "U", "N", "L"),      # labor PAC: in pac_ids but neither bucket
        cm("C00000104", "U", "O", ""),       # super PAC
        cm("C00000105", "P", "P", ""),       # principal campaign cmte (not PAC/superPAC)
        cm("C00000106", "U", "Q", "C"),      # corp PAC feeding invalid candidate
    ]


def _rows_ccl():
    # CAND_ID, CAND_ELECTION_YR, FEC_ELECTION_YR, CMTE_ID, CMTE_TP, CMTE_DSGN, LINKAGE_ID
    return [
        ["S1AA00001", "2016", "2016", "C00000201", "P", "P", "L1"],
        # C00000202 linked to two candidates: A-designation row first in
        # file, P-designation second -> principal (00002) must win
        ["S1AA00001", "2016", "2016", "C00000202", "P", "A", "L2"],
        ["S1AA00002", "2016", "2016", "C00000202", "P", "P", "L3"],
        ["P1XX00004", "2016", "2016", "C00000203", "P", "P", "L4"],
        ["P1XX00005", "2016", "2016", "C00000204", "P", "A", "L5"],
        ["S1EE00008", "2016", "2016", "C00000205", "P", "P", "L6"],
        ["H1CC00006", "2016", "2016", "C00000206", "P", "P", "L7"],  # H: not a valid candidate
        ["S1DD00007", "2014", "2014", "C00000207", "P", "P", "L8"],  # 2014: not valid
    ]


def _fact_row(cmte, tp, entity, amt, sub, cand=None):
    base = [cmte, "N", "Q1", "P", "IMG", tp, entity, "NAME", "CITY", "AA", "00000", "EMP", "OCC", "01012016", amt, "OTH"]
    if cand is None:
        return base + ["T1", "1", "", "", sub]  # itcont: 21 cols
    return base + [cand, "T1", "1", "", "", sub]  # itpas2: 22 cols


def _rows_itcont():
    r = [
        _fact_row("C00000201", "15", "IND", "100", "S1"),     # -> S1AA00001
        _fact_row("C00000201", "15E", "IND", "50.5", "S2"),   # 15E included (code wins over docs)
        _fact_row("C00000201", "15", "ORG", "999", "S3"),     # entity filtered
        _fact_row("C00000201", "22Y", "IND", "999", "S4"),    # tp filtered
        _fact_row("C00000201", "15", "IND", "-20", "S5"),     # negative filtered
        _fact_row("C00000201", "15", "IND", "0", "S6"),       # zero filtered
        _fact_row("C00000201", "15", "IND", "N/A", "S7"),     # junk coerced->dropped
        _fact_row("C00000202", "15", "IND", "200", "S8"),     # -> principal S1AA00002
        _fact_row("C00000203", "15", "IND", "300", "S9"),     # -> P1XX00004
        _fact_row("C00000205", "15", "IND", "25", "S10"),     # -> dup-cand S1EE00008
        _fact_row("C00000206", "15", "IND", "77", "S11"),     # -> H cand: dropped by semi
        _fact_row("C00000999", "15", "IND", "88", "S12"),     # unknown cmte: dropped by map
        _fact_row("C00000201", "15", "IND", "44.25", "S13"),  # second contribution same cand
    ]
    return r


def _rows_itpas2():
    return [
        _fact_row("C00000101", "24K", "PAC", "1000", "P1", "S1AA00001"),   # corp PAC
        _fact_row("C00000101", "24K", "PAC", "500", "P2", "P1XX00004"),    # corp PAC, pres
        _fact_row("C00000102", "24Z", "PAC", "250", "P3", "S1AA00001"),    # nonconnected
        _fact_row("C00000103", "24K", "PAC", "123", "P4", "S1AA00001"),    # labor: neither bucket
        _fact_row("C00000101", "24E", "PAC", "999", "P5", "S1AA00001"),    # 24E excluded from PAC
        _fact_row("C00000101", "24A", "PAC", "999", "P6", "S1AA00001"),    # 24A excluded
        _fact_row("C00000104", "24E", "PAC", "800", "P7", "S1AA00001"),    # superpac IE
        _fact_row("C00000104", "24E", "PAC", "600", "P8", "P1XX00005"),    # superpac IE pres
        _fact_row("C00000104", "24E", "PAC", "-5", "P9", "S1AA00001"),     # negative filtered
        _fact_row("C00000104", "24K", "PAC", "999", "P10", "S1AA00001"),   # superpac non-24E: not IE; not PAC (TP='O')
        _fact_row("C00000104", "24E", "PAC", "450", "P11", "H1CC00006"),   # invalid cand
        _fact_row("C00000106", "24K", "PAC", "450", "P12", "S1DD00007"),   # 2014 cand: invalid
        _fact_row("C00000102", "24K", "PAC", "75.25", "P13", "S1AA00002"), # nonconnected
    ]


def write_fixture(root: Path) -> dict[str, Path]:
    root.mkdir(parents=True, exist_ok=True)
    paths = {}
    for name, rows in (
        ("cn", _rows_cn()),
        ("cm", _rows_cm()),
        ("ccl", _rows_ccl()),
        ("itcont", _rows_itcont()),
        ("itpas2", _rows_itpas2()),
    ):
        d = root / name
        d.mkdir(exist_ok=True)
        p = d / f"{name}.txt"
        with open(p, "w") as fh:
            for r in rows:
                fh.write("|".join("" if v is None else str(v) for v in r) + "\n")
            if name == "itcont":
                # malformed line: too many fields -> DROPMALFORMED parity
                fh.write("|".join(["X"] * 30) + "\n")
        paths[name] = p
    return paths


# ------------------------------------------------------------- oracle

EXPECTED = {
    # computed by hand from the rows above (and re-derivable by reading them)
    "individual": {"S1AA00001": 194.75, "S1AA00002": 200.0, "P1XX00004": 300.0, "S1EE00008": 25.0},
    "corp": {"S1AA00001": 1000.0, "P1XX00004": 500.0},
    "nonconn": {"S1AA00001": 250.0, "S1AA00002": 75.25},
    "superpac": {"S1AA00001": 800.0, "P1XX00005": 600.0},
    # pac table keys = corp ∪ nonconn (labor-only rows excluded)
    "pac_keys": {"S1AA00001", "P1XX00004", "S1AA00002"},
    "spine_ids": {"S1AA00001", "S1AA00002", "S1BB00003", "P1XX00004", "P1XX00005", "S1EE00008"},
    "dup_winner_name": "DUP, PCC",
    "zero_support_ids": {"S1BB00003"},
}
