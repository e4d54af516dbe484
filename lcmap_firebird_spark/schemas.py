"""Declared schemas — the engine's schema registry.

The reference declares every dataset schema explicitly (SURVEY.md
§1.2; no inference anywhere). These StructTypes reproduce them:

- chip ids            ccdc/ids.py:9-13
- tile ids            ccdc/ids.py:16-20
- ard timeseries      ccdc/timeseries.py:33-45
- aux timeseries      ccdc/timeseries.py:46-56
- ccd segments        ccdc/pyccd.py:39-81 (40-field superset)
- chip / pixel / segment / tile persisted projections
                      ccdc/chip.py:15-22, ccdc/pixel.py:14-21,
                      ccdc/segment.py:16-56, ccdc/tile.py:16-25

Dates: the reference stores sday/eday/bday as ISO-8601 *strings*
converted from ordinals (ccdc/pyccd.py:113-115). We keep that shape
for fidelity, but the segmentation operator also carries ordinal ints
(SURVEY §7.5 flags the reference's latent string-vs-int comparison
bug; we avoid it by filtering on ordinals and rendering ISO at the
edge).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    ByteType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def chip_id_schema() -> StructType:
    """Chip coordinate keys (ccdc/ids.py:9-13)."""
    return StructType(
        [
            StructField("cx", IntegerType(), False),
            StructField("cy", IntegerType(), False),
        ]
    )


def tile_id_schema() -> StructType:
    """Tile coordinate keys (ccdc/ids.py:16-20)."""
    return StructType(
        [
            StructField("tx", IntegerType(), False),
            StructField("ty", IntegerType(), False),
        ]
    )


def _pixel_keys() -> list[StructField]:
    return [
        StructField("cx", IntegerType(), False),
        StructField("cy", IntegerType(), False),
        StructField("px", IntegerType(), False),
        StructField("py", IntegerType(), False),
    ]


def ard_schema() -> StructType:
    """Dense-wide ARD pixel time series (ccdc/timeseries.py:33-45).

    All 9 arrays are positionally aligned to `dates` (FIXTURES.md §2);
    the assembly operator enforces this with
    sort_array(collect_list(struct(...))) rather than shuffle order.
    """
    arr = ArrayType(IntegerType())
    return StructType(
        _pixel_keys()
        + [
            StructField("dates", arr, False),
            StructField("blues", arr, False),
            StructField("greens", arr, False),
            StructField("reds", arr, False),
            StructField("nirs", arr, False),
            StructField("swir1s", arr, False),
            StructField("swir2s", arr, False),
            StructField("thermals", arr, False),
            StructField("qas", arr, False),
        ]
    )


def aux_schema() -> StructType:
    """Auxiliary per-pixel layers (ccdc/timeseries.py:46-56)."""
    return StructType(
        _pixel_keys()
        + [
            StructField("dates", ArrayType(IntegerType()), False),
            StructField("dem", ArrayType(FloatType()), True),
            StructField("trends", ArrayType(IntegerType()), False),
            StructField("aspect", ArrayType(IntegerType()), True),
            StructField("posidex", ArrayType(FloatType()), True),
            StructField("slope", ArrayType(FloatType()), True),
            StructField("mpw", ArrayType(IntegerType()), True),
        ]
    )


_BANDS = ("bl", "gr", "re", "ni", "s1", "s2", "th")


def segment_schema(with_dates_mask: bool = True) -> StructType:
    """CCD change-model output (ccdc/pyccd.py:39-81, 40 fields).

    `with_dates_mask=False` gives the persisted `segment` table shape
    (ccdc/segment.py:16-56) which drops the chip-level `dates` and
    pixel-level `mask` arrays.
    """
    farr = ArrayType(FloatType())
    fields = _pixel_keys() + [
        StructField("sday", StringType(), False),
        StructField("eday", StringType(), False),
        StructField("bday", StringType(), True),
        StructField("chprob", FloatType(), True),
        StructField("curqa", IntegerType(), True),
    ]
    fields += [StructField(f"{b}mag", FloatType(), True) for b in _BANDS]
    fields += [StructField(f"{b}rmse", FloatType(), True) for b in _BANDS]
    fields += [StructField(f"{b}coef", farr, True) for b in _BANDS]
    fields += [StructField(f"{b}int", FloatType(), True) for b in _BANDS]
    if with_dates_mask:
        # reference field order ends dates, mask, rfrawp
        # (ccdc/pyccd.py:77-81)
        fields += [
            StructField("dates", ArrayType(StringType()), False),
            StructField("mask", ArrayType(ByteType()), True),
            StructField("rfrawp", farr, True),
        ]
    else:
        # persisted segment projection ends rfrawp (ccdc/segment.py)
        fields += [StructField("rfrawp", farr, True)]
    return StructType(fields)


def chip_schema() -> StructType:
    """Chip table projection (ccdc/chip.py:15-22; golden
    'struct<cx:int,cy:int,dates:array<string>>' test/test_chip.py:13-14)."""
    return StructType(
        [
            StructField("cx", IntegerType(), False),
            StructField("cy", IntegerType(), False),
            StructField("dates", ArrayType(StringType()), False),
        ]
    )


def pixel_schema() -> StructType:
    """Pixel table projection (ccdc/pixel.py:14-21; golden
    'struct<cx:int,cy:int,px:int,py:int,mask:array<tinyint>>')."""
    return StructType(
        _pixel_keys() + [StructField("mask", ArrayType(ByteType()), True)]
    )


def tile_schema() -> StructType:
    """Tile / model-metadata table (ccdc/tile.py:16-25)."""
    return StructType(
        [
            StructField("tx", IntegerType(), False),
            StructField("ty", IntegerType(), False),
            StructField("name", StringType(), False),
            StructField("model", StringType(), False),
            StructField("updated", StringType(), False),
        ]
    )
