"""Typed extraction of the Slides element payload — the reference's richest
nested data shape (SURVEY §1.2).

The reference builds this JSON client-side per selected element
(getElementProperties, slides-code.gs:312-375: position/size always; fill +
border + text for shapes and text boxes; imageProperties for images;
tableProperties — including the hasHeader row-height heuristic,
slides-code.gs:358 — for tables; groupProperties for groups), wraps table
cells in a tableSelection envelope (slides-code.gs:257-262), pages in
pageNumber/layout properties (slides-code.gs:282-285), and text runs in a
textStyle struct (slides-code.gs:294-310). Server-side it is opaque TEXT
(db.mjs:257); the engine instead models it as a typed nested StructType
(sources.ELEMENT_SCHEMA) so extraction is columnar, null-safe and prunable.

The query synthesizes payloads deterministically from `events` rows (the
fixture standing in for the updates queue, SURVEY §7), serializes them with
to_json, parses them back through ELEMENT_SCHEMA with from_json, and
extracts one flat typed column per leaf the clients read. The serialize →
parse round trip is the point: a field-name or type error in ELEMENT_SCHEMA
yields nulls that the oracle — which computes the same values directly —
catches as a hash mismatch.

Bench note: wall time was originally whole-stage-codegen compilation of a
250 KB single-stage expression tree (Catalyst elides the to_json->from_json
round trip and inlines payload construction into every leaf extraction);
an exchange between build and parse restores a real parse stage and cut the
plan to 41 KB / ~1 s (see the comment at the repartition below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..sources import ELEMENT_SCHEMA

# Deterministic element-type rotation over event_id % 10; TABLE_CELL is the
# table-selection envelope case, PAGE the current-page selection case.
_TYPE_CASE_SQL = """
    CASE event_id % 10
      WHEN 0 THEN 'SHAPE' WHEN 5 THEN 'SHAPE'
      WHEN 1 THEN 'TEXT_BOX' WHEN 6 THEN 'TEXT_BOX'
      WHEN 2 THEN 'IMAGE' WHEN 7 THEN 'IMAGE'
      WHEN 3 THEN 'TABLE'
      WHEN 8 THEN 'TABLE_CELL'
      WHEN 4 THEN 'GROUP'
      ELSE 'PAGE'
    END
"""


def _hex_color(col, mult: int):
    # '#rrggbb' from a deterministic integer; hex() is uppercase in both
    # Spark and DuckDB, lpad pads the sub-16^6 values identically.
    return F.concat(F.lit("#"), F.lpad(F.hex((col * mult) % 16777216), 6, "0"))


@register(
    "q125_element_payload_extract",
    oracle=f"""
    WITH src AS (
      SELECT event_id, event_type, user_id, {_TYPE_CASE_SQL} AS etype
      FROM events WHERE event_id < 3000
    )
    SELECT
      'el-' || event_id AS element_id,
      etype AS element_type,
      'slide-' || (user_id % 20) AS slide_id,
      'slide-' || (user_id % 20) AS slide_index,
      CAST(event_id % 720 AS DOUBLE) AS pos_left,
      CAST(event_id % 405 AS DOUBLE) AS pos_top,
      CAST(100 + event_id % 300 AS DOUBLE) AS width,
      CAST(50 + event_id % 200 AS DOUBLE) AS height,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX') THEN 'txt-' || event_type END AS text,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX')
           THEN CASE WHEN event_id % 2 = 0 THEN 'RECTANGLE' ELSE 'ELLIPSE' END
      END AS shape_type,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX')
           THEN '#' || lpad(hex((event_id * 2654435761) % 16777216), 6, '0')
      END AS fill_color,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX')
           THEN CAST(1 + event_id % 5 AS DOUBLE)
      END AS border_weight,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX')
           THEN CASE event_id % 3 WHEN 0 THEN 'SOLID' WHEN 1 THEN 'DASH' ELSE 'DOT' END
      END AS border_dash,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX') THEN event_id % 2 = 0 END AS style_bold,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX') THEN CAST(8 + event_id % 24 AS INT) END AS style_font_size,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX')
           THEN CASE WHEN event_id % 2 = 0 THEN 'Arial' ELSE 'Roboto' END
      END AS style_font_family,
      CASE WHEN etype IN ('SHAPE', 'TEXT_BOX')
           THEN '#' || lpad(hex((event_id * 97) % 16777216), 6, '0')
      END AS style_foreground,
      CASE WHEN etype = 'IMAGE' THEN 'https://img.example/' || event_id END AS image_url,
      CASE WHEN etype = 'IMAGE' THEN (event_id % 100) / 100.0 END AS image_brightness,
      CASE WHEN etype IN ('TABLE', 'TABLE_CELL') THEN CAST(1 + event_id % 9 AS INT) END AS n_rows,
      CASE WHEN etype IN ('TABLE', 'TABLE_CELL') THEN CAST(1 + event_id % 7 AS INT) END AS n_cols,
      CASE WHEN etype IN ('TABLE', 'TABLE_CELL') THEN (event_id % 30) > (event_id % 17) END AS has_header,
      CASE WHEN etype = 'TABLE_CELL' THEN CAST(event_id % 4 AS INT) END AS sel_row,
      CASE WHEN etype = 'TABLE_CELL' THEN CAST(event_id % 6 AS INT) END AS sel_column,
      CASE WHEN etype = 'TABLE_CELL' THEN CAST(1 + event_id % 2 AS INT) END AS sel_col_span,
      CASE WHEN etype = 'GROUP' THEN CAST(1 + event_id % 8 AS INT) END AS n_children,
      CASE WHEN etype = 'PAGE' THEN CAST(event_id % 40 AS VARCHAR) END AS page_number,
      CASE WHEN etype = 'PAGE'
           THEN CASE WHEN event_id % 2 = 0 THEN 'TITLE' ELSE 'BLANK' END
      END AS page_layout,
      CAST(1700000000000 + event_id AS BIGINT) AS ts_millis
    FROM src
    """,
)
def q125_element_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slides element payload, end to end: synthesize → to_json → from_json
    (typed ELEMENT_SCHEMA) → flat typed extraction of every leaf the clients
    read (slides-code.gs:312-375,257-262,282-310). One scan plus one bounded
    exchange of the serialized payloads (see the repartition comment below —
    it keeps the parse stage real and the codegen unit small); at 100 TB the
    JSON parse is JVM-side Jackson inside codegen, and unreferenced payload
    branches are pruned from the parse (from_json schema pruning), so
    extracting two leaves does not pay for sixteen. On a real ingest the
    strings arrive from the source and no synthetic build stage exists at
    all — stage 2 here IS the production plan."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    eid, uid = F.col("event_id"), F.col("user_id")
    etype = F.expr(_TYPE_CASE_SQL)
    is_shape = etype.isin("SHAPE", "TEXT_BOX")
    is_table = etype.isin("TABLE", "TABLE_CELL")

    fill = F.struct(
        F.lit("SOLID").alias("type"), _hex_color(eid, 2654435761).alias("color")
    )
    border = F.struct(
        (1 + eid % 5).cast("double").alias("weight"),
        F.when(eid % 3 == 0, "SOLID").when(eid % 3 == 1, "DASH").otherwise("DOT").alias("dashStyle"),
        _hex_color(eid, 40503).alias("color"),
    )
    image_props = F.struct(
        F.concat(F.lit("https://img.example/"), eid).alias("sourceUrl"),
        ((eid % 100) / F.lit(100.0)).alias("brightness"),
        F.lit(0.0).alias("contrast"),
        F.lit(0.0).alias("transparency"),
    )
    # hasHeader mirrors the reference's row-height heuristic (F14,
    # slides-code.gs:358): row0.minHeight > row1.minHeight, with the two
    # heights synthesized as event_id % 30 and % 17.
    table_props = F.struct(
        (1 + eid % 9).cast("int").alias("numRows"),
        (1 + eid % 7).cast("int").alias("numColumns"),
        ((eid % 30) > (eid % 17)).alias("hasHeader"),
    )
    group_props = F.struct((1 + eid % 8).cast("int").alias("numChildren"))
    text_style = F.struct(
        (eid % 2 == 0).alias("bold"),
        (eid % 3 == 0).alias("italic"),
        (eid % 5 == 0).alias("underline"),
        (eid % 7 == 0).alias("strikethrough"),
        (8 + eid % 24).cast("int").alias("fontSize"),
        F.when(eid % 2 == 0, "Arial").otherwise("Roboto").alias("fontFamily"),
        _hex_color(eid, 97).alias("foregroundColor"),
        _hex_color(eid, 31).alias("backgroundColor"),
    )
    properties = F.struct(
        etype.alias("type"),
        F.struct(
            (eid % 720).cast("double").alias("left"),
            (eid % 405).cast("double").alias("top"),
        ).alias("position"),
        F.struct(
            (100 + eid % 300).cast("double").alias("width"),
            (50 + eid % 200).cast("double").alias("height"),
        ).alias("size"),
        F.when(is_shape, F.concat(F.lit("txt-"), F.col("event_type"))).alias("text"),
        F.when(is_shape, F.when(eid % 2 == 0, "RECTANGLE").otherwise("ELLIPSE")).alias("shapeType"),
        F.when(is_shape, fill).alias("fill"),
        F.when(is_shape, border).alias("border"),
        F.when(etype == "IMAGE", image_props).alias("imageProperties"),
        F.when(is_table, table_props).alias("tableProperties"),
        F.when(etype == "GROUP", group_props).alias("groupProperties"),
        F.when(etype == "PAGE", (eid % 40).cast("string")).alias("pageNumber"),
        F.when(etype == "PAGE", F.when(eid % 2 == 0, "TITLE").otherwise("BLANK")).alias("layout"),
        F.when(is_shape, text_style).alias("textStyle"),
    )
    table_selection = F.struct(
        (eid % 4).cast("int").alias("row"),
        (eid % 6).cast("int").alias("column"),
        F.lit(1).alias("rowSpan"),
        (1 + eid % 2).cast("int").alias("columnSpan"),
    )
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("el-"), eid).alias("elementId"),
            etype.alias("elementType"),
            # slideId == slideName == slideIndex: the reference sets all
            # three to the page objectId (slides-code.gs:254-256)
            F.concat(F.lit("slide-"), uid % 20).alias("slideId"),
            F.concat(F.lit("slide-"), uid % 20).alias("slideName"),
            F.concat(F.lit("slide-"), uid % 20).alias("slideIndex"),
            F.when(etype == "TABLE_CELL", table_selection).alias("tableSelection"),
            properties.alias("properties"),
            (F.lit(1700000000000) + eid).alias("timestamp"),
        )
    )

    # Materialize the JSON strings across an exchange before parsing. Without
    # the boundary, Catalyst's json-expression optimization elides the
    # to_json -> from_json round trip entirely and inlines the payload
    # construction into all ~25 leaf extractions — a 250 KB single-stage
    # expression tree whose whole-stage-codegen compile dominated wall time
    # (~3.9 s) while never actually parsing JSON. With the exchange, stage 1
    # builds each payload once, real strings cross the wire (the ingest shape
    # S4 models), and stage 2 runs schema-pruned from_json per leaf.
    serialized = events.select("event_id", payload.alias("payload_json")).repartition(
        "event_id"
    )
    p = F.from_json(F.col("payload_json"), ELEMENT_SCHEMA)
    return serialized.select(
        p["elementId"].alias("element_id"),
        p["elementType"].alias("element_type"),
        p["slideId"].alias("slide_id"),
        p["slideIndex"].alias("slide_index"),
        p["properties"]["position"]["left"].alias("pos_left"),
        p["properties"]["position"]["top"].alias("pos_top"),
        p["properties"]["size"]["width"].alias("width"),
        p["properties"]["size"]["height"].alias("height"),
        p["properties"]["text"].alias("text"),
        p["properties"]["shapeType"].alias("shape_type"),
        p["properties"]["fill"]["color"].alias("fill_color"),
        p["properties"]["border"]["weight"].alias("border_weight"),
        p["properties"]["border"]["dashStyle"].alias("border_dash"),
        p["properties"]["textStyle"]["bold"].alias("style_bold"),
        p["properties"]["textStyle"]["fontSize"].alias("style_font_size"),
        p["properties"]["textStyle"]["fontFamily"].alias("style_font_family"),
        p["properties"]["textStyle"]["foregroundColor"].alias("style_foreground"),
        p["properties"]["imageProperties"]["sourceUrl"].alias("image_url"),
        p["properties"]["imageProperties"]["brightness"].alias("image_brightness"),
        p["properties"]["tableProperties"]["numRows"].alias("n_rows"),
        p["properties"]["tableProperties"]["numColumns"].alias("n_cols"),
        p["properties"]["tableProperties"]["hasHeader"].alias("has_header"),
        p["tableSelection"]["row"].alias("sel_row"),
        p["tableSelection"]["column"].alias("sel_column"),
        p["tableSelection"]["columnSpan"].alias("sel_col_span"),
        p["properties"]["groupProperties"]["numChildren"].alias("n_children"),
        p["properties"]["pageNumber"].alias("page_number"),
        p["properties"]["layout"].alias("page_layout"),
        p["timestamp"].alias("ts_millis"),
    )
