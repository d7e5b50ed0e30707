"""HBase-style table schema (SURVEY.md §1.2) — rowkey + family structs.

Reference: connector/hbase/util/HBaseTableSchema.java — families are nested
ROW types of qualifiers, the rowkey is the single atomic top-level field.
Validation rules preserved:

- exactly one atomic top-level field, and it is the rowkey
  (HBase2DynamicTableFactory.java:175-198 validatePrimaryKey;
  HBase2TableFactory.java:96-125 validateTableSchema);
- the rowkey can be set only once (HBaseTableSchema.java:115-117);
- unsupported column types are rejected at declaration time with the
  reference's advice to store byte[] and decode with a UDF
  (HBaseTableSchema.java:76-83, 107-114);
- charset is configurable per table (HBaseTableSchema.java:55,126-128).

Spark upgrade (documented, intentional): the reference cannot project
individual qualifiers inside a family (supportsNestedProjection() -> false,
AbstractHBaseDynamicTableSource.java:86-90); Spark's nested-schema pruning
can, so ``scan`` here accepts ``family.qualifier`` selections.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DayTimeIntervalType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    YearMonthIntervalType,
)

# §1.3 type whitelist (HBaseTypeUtils.java:134-166 legacy index table +
# HBaseSerde.java LogicalType codec). DecimalType handled structurally.
_SUPPORTED_ATOMIC: tuple[type, ...] = (
    BinaryType,
    StringType,
    ByteType,
    ShortType,
    IntegerType,
    LongType,
    FloatType,
    DoubleType,
    BooleanType,
    TimestampType,
    DateType,
    DecimalType,
    YearMonthIntervalType,  # HBaseSerde.java:300 (int-months encoding)
    DayTimeIntervalType,  # HBaseSerde.java:313 (long-millis encoding)
)


def _check_supported(dtype: DataType, where: str) -> None:
    if not isinstance(dtype, _SUPPORTED_ATOMIC):
        # mirrors HBaseTableSchema.java:76-83 error guidance
        raise TypeError(
            f"Unsupported class type found: {dtype.simpleString()} for {where}. "
            "Better to use byte[].class and deserialize using user defined scalar "
            "functions"
        )


@dataclass
class HBaseTableSchema:
    """rowkey + ordered family→qualifier type map."""

    charset: str = "UTF-8"
    rowkey_name: str | None = None
    rowkey_type: DataType | None = None
    families: dict[str, dict[str, DataType]] = field(default_factory=dict)

    def set_row_key(self, name: str, dtype: DataType) -> "HBaseTableSchema":
        if self.rowkey_name is not None:
            # HBaseTableSchema.java:115-117
            raise ValueError("Row key can't be set multiple times.")
        _check_supported(dtype, f"row key '{name}'")
        self.rowkey_name = name
        self.rowkey_type = dtype
        return self

    def add_column(self, family: str, qualifier: str, dtype: DataType) -> "HBaseTableSchema":
        _check_supported(dtype, f"column '{family}:{qualifier}'")
        self.families.setdefault(family, {})[qualifier] = dtype
        return self

    # -- §1.1 row 3: families-as-ROW + rowkey ------------------------------
    def to_struct_type(self) -> StructType:
        if self.rowkey_name is None:
            raise ValueError("row key must be declared")
        fields = [StructField(self.rowkey_name, self.rowkey_type, False)]
        for fam, quals in self.families.items():
            fields.append(
                StructField(
                    fam,
                    StructType([StructField(q, t, True) for q, t in quals.items()]),
                    True,
                )
            )
        return StructType(fields)

    @classmethod
    def from_struct_type(cls, st: StructType, charset: str = "UTF-8") -> "HBaseTableSchema":
        """DDL-side inverse (HBase2TableFactory.java:96-125): ROW fields are
        families, the single atomic field is the rowkey."""
        schema = cls(charset=charset)
        atomic = [f for f in st.fields if not isinstance(f.dataType, StructType)]
        if len(atomic) != 1:
            raise ValueError(
                f"Unsupported table schema: expected exactly one atomic top-level "
                f"field (the row key), found {len(atomic)}"
            )
        schema.set_row_key(atomic[0].name, atomic[0].dataType)
        for f in st.fields:
            if isinstance(f.dataType, StructType):
                for q in f.dataType.fields:
                    schema.add_column(f.name, q.name, q.dataType)
        return schema

    def project(self, selections: dict[str, list[str] | None]) -> "HBaseTableSchema":
        """C1 projection pushdown (HBaseTableSchema.java:277-299): keep only
        the named families; None keeps all of a family's qualifiers.
        Qualifier-level selection is the Spark-side nested-pruning upgrade."""
        out = HBaseTableSchema(charset=self.charset)
        out.set_row_key(self.rowkey_name, self.rowkey_type)
        for fam, quals in selections.items():
            if fam not in self.families:
                raise KeyError(f"unknown family '{fam}'")
            for q in (quals if quals is not None else self.families[fam]):
                out.add_column(fam, q, self.families[fam][q])
        return out
