"""Table handles — the data model of SURVEY §1.1.

Mirrors the reference's ``Metadata`` / ``BaseTable`` / ``TempTable`` / ``Table``
(``python-sdk/src/astro/table.py:18-250``) as lightweight handles over Spark
catalog names. A handle is a *reference*: data lives in the Spark catalog
(managed parquet tables in spark-warehouse/ or temp views), never inside the
handle object.

Parity notes:
- temp names use the ``_tmp_`` prefix and are capped at 62 chars
  (reference ``table.py:14-15, 79-94``).
- ``Table()`` with no name ⇒ a temp table (reference ``table.py:230-235``).
- lineage URI ``astro://...`` (reference ``table.py:237-250``) becomes
  ``spark://{database}?table={name}`` — recorded, not scheduled on.
"""

from __future__ import annotations

import random
import string
from dataclasses import dataclass, field

from pyspark.sql.types import StructType

MAX_TABLE_NAME_LENGTH = 62
TEMP_PREFIX = "_tmp"


def _random_suffix(n: int = 8) -> str:
    return "".join(random.choice(string.ascii_lowercase) for _ in range(n))


@dataclass
class Metadata:
    """(schema, database) namespace pair — reference ``table.py:18-34``.

    Spark has a 2-level namespace (database.table); the reference's
    ``schema`` maps onto Spark's database.
    """

    schema: str | None = None
    database: str | None = None

    def is_empty(self) -> bool:
        return self.schema is None and self.database is None

    @property
    def spark_database(self) -> str | None:
        return self.schema or self.database


@dataclass
class BaseTable:
    """Named handle to a Spark SQL table — reference ``table.py:37-199``."""

    name: str = ""
    conn_id: str = ""  # kept for API parity; unused (single session)
    metadata: Metadata = field(default_factory=Metadata)
    columns: StructType | None = None
    temp: bool = False

    def __post_init__(self) -> None:
        if not self.name:
            self.name = self._create_unique_table_name(TEMP_PREFIX)
            self.temp = True
        if self.name.startswith("_"):
            # Spark identifiers can start with _, keep as-is; reference
            # treats leading-underscore names as temp (table.py:96-102).
            self.temp = True

    @staticmethod
    def _create_unique_table_name(prefix: str = "") -> str:
        """Generate a unique name ≤62 chars — reference ``table.py:79-94``."""
        unique_id = _random_suffix(16)
        name = f"{prefix}_{unique_id}" if prefix else unique_id
        return name[:MAX_TABLE_NAME_LENGTH]

    @property
    def qualified_name(self) -> str:
        db = self.metadata.spark_database if self.metadata else None
        return f"{db}.{self.name}" if db else self.name

    @property
    def row_count_placeholder(self) -> str:  # pragma: no cover - parity shim
        return self.qualified_name

    @property
    def uri(self) -> str:
        """Lineage URI — reference ``table.py:237-250``."""
        db = (self.metadata.spark_database or "default") if self.metadata else "default"
        return f"spark://{db}?table={self.name}"


@dataclass
class TempTable(BaseTable):
    """Auto-named temp table — reference ``table.py:202-210``."""

    temp: bool = True

    def __post_init__(self) -> None:
        if not self.name:
            self.name = self._create_unique_table_name(TEMP_PREFIX)
        self.temp = True


class Table(BaseTable):
    """User-facing table handle — reference ``table.py:213-250``."""
