"""htype → Spark type mapping (SURVEY §1.2; reference
``muller/core/types/htype.py:119-210``).

Fixed-scalar htypes map to native Spark types; ragged ndarray htypes map
to ``BinaryType`` (encoded bytes, the analogue of the reference's
``sample_compression``) with an ``array<int>`` companion shape column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# htype → (spark type, needs companion _shape column)
HTYPE_SPARK_TYPE: dict[str, tuple[T.DataType, bool]] = {
    "generic": (T.DoubleType(), False),
    "text": (T.StringType(), False),
    "json": (T.StringType(), False),
    "list": (T.ArrayType(T.StringType()), False),
    "image": (T.BinaryType(), True),
    "image.rgb": (T.BinaryType(), True),
    "image.gray": (T.BinaryType(), True),
    "video": (T.BinaryType(), True),
    "audio": (T.BinaryType(), True),
    "class_label": (T.IntegerType(), False),
    "bbox": (T.ArrayType(T.FloatType()), False),
    "bbox.3d": (T.ArrayType(T.FloatType()), False),
    "vector": (T.ArrayType(T.FloatType()), False),
    "embedding": (T.ArrayType(T.FloatType()), False),
    "binary_mask": (T.BinaryType(), True),
    "segment_mask": (T.BinaryType(), True),
    "instance_label": (T.BinaryType(), True),
    "keypoints_coco": (T.ArrayType(T.FloatType()), False),
    "point": (T.ArrayType(T.FloatType()), False),
    "point_cloud": (T.BinaryType(), True),
    "intrinsics": (T.ArrayType(T.FloatType()), False),
    "polygon": (T.ArrayType(T.ArrayType(T.FloatType())), False),
    "mesh": (T.BinaryType(), True),
    "dicom": (T.BinaryType(), True),
    "nifti": (T.BinaryType(), True),
}

DTYPE_SPARK_TYPE: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "int": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.LongType(),
    "float16": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "str": T.StringType(),
}

UUID_COL = "_uuid"
ROW_ID_COL = "_row_id"
HIDDEN_COLS = (UUID_COL, ROW_ID_COL)


def spark_type_for(htype: str = "generic", dtype: str | None = None) -> T.DataType:
    if htype not in HTYPE_SPARK_TYPE:
        raise ValueError(f"unknown htype {htype!r}")
    base, _ = HTYPE_SPARK_TYPE[htype]
    if dtype is not None and htype in {"generic", "class_label"}:
        if dtype not in DTYPE_SPARK_TYPE:
            raise ValueError(f"unknown dtype {dtype!r}")
        return DTYPE_SPARK_TYPE[dtype]
    if dtype is not None and htype in {"vector", "embedding", "bbox"}:
        return T.ArrayType(DTYPE_SPARK_TYPE[dtype])
    return base


def needs_shape_companion(htype: str) -> bool:
    return HTYPE_SPARK_TYPE.get(htype, (None, False))[1]
