"""Excel HR-master ingest — SURVEY.md §2.1 S5.

The reference loads the 161-row HR spreadsheet with ``pd.read_excel`` and
maps French headers to the DB schema row-by-row
(``commute_validation/commute_validation.py:187-209``). Engine version:
pandas (driver-side — a master-data file is tiny by definition) -> rename/
cast normalization -> ``spark.createDataFrame`` with the canonical
employees schema. ``pd.read_excel`` is used when ``openpyxl`` is
installed; otherwise a minimal stdlib decoder handles the standard xlsx
layout (a zip of sheet XML + shared strings), so the ingest works with no
optional dependency at all.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_data_infrastructure_spark.schemas import EMPLOYEES

_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'B7' -> 1 (0-based column from the letter prefix)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx_minimal(path: str) -> pd.DataFrame:
    """Stdlib xlsx decode (zipfile + ElementTree): first sheet, first row
    as header, shared/inline strings and numeric cells; every value comes
    back as a string and the schema cast downstream coerces types. Covers
    the standard layout every xlsx writer (incl. Excel) produces."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t"))
                )
        sheets = sorted(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheets:
            raise ValueError(f"no worksheets found in {path}")
        root = ET.fromstring(z.read(sheets[0]))
    rows: list[dict[int, str | None]] = []
    for row in root.iter(f"{_XLSX_NS}row"):
        cells: dict[int, str | None] = {}
        for c in row.findall(f"{_XLSX_NS}c"):
            idx = _col_index(c.get("r", "A1"))
            v = c.find(f"{_XLSX_NS}v")
            if c.get("t") == "s" and v is not None:
                cells[idx] = shared[int(v.text)]
            elif c.get("t") == "inlineStr":
                is_el = c.find(f"{_XLSX_NS}is")
                cells[idx] = (
                    "".join(t.text or "" for t in is_el.iter(f"{_XLSX_NS}t"))
                    if is_el is not None
                    else None
                )
            else:
                cells[idx] = v.text if v is not None else None
        rows.append(cells)
    if not rows or not rows[0]:
        return pd.DataFrame()  # no header row => empty frame, not a crash
    header, body = rows[0], rows[1:]
    ncol = max(header) + 1
    cols = [header.get(i, f"col{i}") for i in range(ncol)]
    return pd.DataFrame(
        [[r.get(i) for i in range(ncol)] for r in body], columns=cols
    )

# French xlsx headers -> employees columns (commute_validation.py:193-203)
FRENCH_COLUMN_MAP = {
    "Matricule": "id_employee",
    "Prénom": "first_name",
    "Nom": "last_name",
    "Date de naissance": "birthday",
    "Date d'embauche": "hire_date",
    "BU": "business_unity",
    "Salaire brut": "gross_salary",
    "Type de contrat": "constract_type",
    "Adresse du domicile": "address",
    "Moyen de déplacement domicile-travail": "transport_mode",
    "Nombre de jours de congés payés": "paid_leaved_days",
}


def read_hr_excel(spark: SparkSession, path: str) -> DataFrame:
    """S5: xlsx -> normalized employees DataFrame. Prefers pandas'
    reader (openpyxl) when available; falls back to the stdlib decoder."""
    try:
        pdf = pd.read_excel(path)
    except ImportError:  # openpyxl missing: stdlib decode
        pdf = read_xlsx_minimal(path)
    return normalize_hr_frame(spark, pdf)


def normalize_hr_frame(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Rename French headers, coerce types to the employees schema.

    Date columns accept BOTH ISO strings and Excel numeric serials (days
    since 1899-12-30) — real Excel stores date cells as serial numbers
    with no type marker, so the stdlib decoder surfaces them as digit
    strings; a plain DateType cast would silently NULL every one.
    """
    import pyspark.sql.types as T

    renamed = pdf.rename(columns=FRENCH_COLUMN_MAP)
    missing = [c for c in FRENCH_COLUMN_MAP.values() if c not in renamed.columns]
    if missing:
        raise ValueError(f"HR frame missing columns: {missing}")
    df = spark.createDataFrame(
        renamed[list(FRENCH_COLUMN_MAP.values())].astype(str)
    )
    casts = {f.name: f.dataType for f in EMPLOYEES.fields}

    def coerce(c: str):
        if isinstance(casts[c], T.DateType):
            serial = F.col(c).cast("double").cast("int")
            return (
                F.when(
                    F.col(c).rlike("^[0-9]+(\\.0)?$"),
                    F.date_add(F.lit("1899-12-30").cast("date"), serial),
                )
                .otherwise(F.col(c).cast("date"))
                .alias(c)
            )
        if isinstance(casts[c], (T.IntegerType, T.LongType)):
            # Route via double: Excel numerics surface as "50000.0", which
            # a direct string->int cast would NULL.
            return F.col(c).cast("double").cast(casts[c]).alias(c)
        return F.col(c).cast(casts[c]).alias(c)

    return df.select(*[coerce(c) for c in FRENCH_COLUMN_MAP.values()])
