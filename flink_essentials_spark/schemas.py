"""Canonical schemas for every record type the engine handles.

The reference derives schemas implicitly from Scala case classes
(TypeInformation — reference BuiltIn.scala:51-52); we make them
explicit StructTypes. ADT hierarchies (reference starcraft/events.scala:8-67,
shopping/ShoppingCartEventsGenerator.scala:14-32) become a single flat
schema with an ``event_type`` discriminator plus nullable
variant-specific columns — the idiomatic columnar encoding of a sum
type, and the shape Structured Streaming state/watermark operators
want.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- StarCraft server events (reference starcraft/events.scala:8-67) ----
# Variants: GameStarted, GameFinished, PlayerRegistered, PlayerOnline,
# PlayerIsLookingForAGame, PlayerOffline. GameType is a closed enum.
GAME_TYPES = ("OneVsOne", "TwoVsTwo", "ThreeVsThree", "FourVsFour")

SERVER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        # player-variant fields
        T.StructField("player_id", T.StringType(), True),
        T.StructField("nickname", T.StringType(), True),
        # game-variant fields
        T.StructField("game_id", T.StringType(), True),
        T.StructField("player_ids", T.ArrayType(T.StringType()), True),
        T.StructField("map_id", T.StringType(), True),
        T.StructField("region_id", T.StringType(), True),
        T.StructField("game_type", T.StringType(), True),
        # entity key: "player|<id>|<nick>" or "game|<id>"
        # (reference events.scala getId — the keyBy key in Windows.scala:330-332)
        T.StructField("entity_id", T.StringType(), False),
    ]
)

# --- Shopping cart events (reference ShoppingCartEventsGenerator.scala:14-32) --
SHOPPING_CART_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("sku", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("time", T.TimestampType(), False),
    ]
)

# --- Catalog events (reference ShoppingCartEventsGenerator.scala:166-175) ----
CATALOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("product_id", T.StringType(), False),
    ]
)

# --- Word-count lines (reference SocketTextStreamWordCount.scala:59) --------
LINES_SCHEMA = T.StructType([T.StructField("value", T.StringType(), False)])

# --- Driver testdata tables (/root/testdata/<sf>/*.parquet) -----------------
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# --- Multimodal payload columns (extension layer, SURVEY §2.11) -------------
# Opaque binary payload + typed metadata; the decode step is stubbed in
# functions/multimodal.py (no codec libs in the image) but the schema,
# partitioning and UDF plumbing are real.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)
