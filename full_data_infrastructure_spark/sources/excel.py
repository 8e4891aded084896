"""Excel HR-master ingest — SURVEY.md §2.1 S5.

The reference loads the 161-row HR spreadsheet with ``pd.read_excel`` and
maps French headers to the DB schema row-by-row
(``commute_validation/commute_validation.py:187-209``). Engine version:
pandas (driver-side — a master-data file is tiny by definition) -> rename/
cast normalization -> ``spark.createDataFrame`` with the canonical
employees schema. ``openpyxl`` is not in the container, so the xlsx read is
import-gated; the normalization path is fully testable from a pandas frame.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_data_infrastructure_spark.schemas import EMPLOYEES

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
    """S5: xlsx -> normalized employees DataFrame (requires openpyxl)."""
    try:
        pdf = pd.read_excel(path)
    except ImportError as exc:  # openpyxl missing in this container
        raise NotImplementedError(
            "reading .xlsx requires openpyxl; install it or use "
            "normalize_hr_frame on a pandas DataFrame"
        ) from exc
    return normalize_hr_frame(spark, pdf)


def normalize_hr_frame(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Rename French headers, coerce types to the employees schema."""
    renamed = pdf.rename(columns=FRENCH_COLUMN_MAP)
    missing = [c for c in FRENCH_COLUMN_MAP.values() if c not in renamed.columns]
    if missing:
        raise ValueError(f"HR frame missing columns: {missing}")
    df = spark.createDataFrame(renamed[list(FRENCH_COLUMN_MAP.values())])
    casts = {f.name: f.dataType for f in EMPLOYEES.fields}
    return df.select(
        *[F.col(c).cast(casts[c]).alias(c) for c in FRENCH_COLUMN_MAP.values()]
    )
