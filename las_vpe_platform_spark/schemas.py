"""Typed schemas for the reference data model (SURVEY §1.1).

Each StructType is the Spark-native equivalent of one Java message
class in /root/reference — the row-oriented Java-serialized objects
(``util/SerializationHelper.java:38-59``) become Tungsten-encoded
columnar rows, so no Kryo registration or custom encoders are needed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Tracklet (alg/pedestrian/tracking/Tracklet.java:42-71) -----------------

BOUNDING_BOX = T.StructType(
    [
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        # BGR CV_8UC3 row-major pixels, nullable (Tracklet.java:216-225);
        # kept as an opaque binary column — the multimodal pattern.
        T.StructField("patch_data", T.BinaryType()),
    ]
)

TRACKLET_ID = T.StructType(
    [
        # Tracklet.Identifier (Tracklet.java:88-139)
        T.StructField("video_id", T.StringType()),
        T.StructField("serial_number", T.IntegerType()),
    ]
)

TRACKLET = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("serial_number", T.IntegerType()),
        # derived: video_id || '_tarid' || serial_number (Tracklet.java:136-138)
        T.StructField("tracklet_key", T.StringType()),
        T.StructField("task_id", T.StringType()),
        T.StructField("num_tracklets", T.IntegerType()),
        T.StructField("start_frame_index", T.IntegerType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("location_sequence", T.ArrayType(BOUNDING_BOX)),
        # claim-check URL (TrackletOrURL.java:34-82); exactly one of
        # location_sequence / stored_url is meaningful per row.
        T.StructField("stored_url", T.StringType()),
    ]
)

# --- Attributes (alg/pedestrian/attr/Attributes.java:36-414) ----------------
# The 125 float fields, named exactly as their @SerializedName values and
# ordered as DeepMAR.ATTR_LIST (alg/pedestrian/attr/DeepMAR.java:164-289).

ATTRIBUTE_NAMES: tuple[str, ...] = (
    "gender_male", "gender_female", "gender_other",
    "age_16", "age_30", "age_45", "age_60", "age_older_60",
    "weight_very_fat", "weight_little_fat", "weight_normal",
    "weight_little_thin", "weight_very_thin",
    "role_client", "role_uniform",
    "hair_style_null", "hair_style_long",
    "head_shoulder_black_hair", "head_shoulder_with_hat",
    "head_shoulder_glasses", "head_shoulder_sunglasses",
    "head_shoulder_scarf", "head_shoulder_mask",
    "upper_shirt", "upper_sweater", "upper_vest", "upper_tshirt",
    "upper_cotton", "upper_jacket", "upper_suit", "upper_hoodie",
    "upper_cotta", "upper_other", "upper_black", "upper_white",
    "upper_gray", "upper_red", "upper_green", "upper_blue",
    "upper_silvery", "upper_yellow", "upper_brown", "upper_purple",
    "upper_pink", "upper_orange", "upper_mix_color", "upper_other_color",
    "lower_pants", "lower_short_pants", "lower_skirt", "lower_short_skirt",
    "lower_long_skirt", "lower_one_piece", "lower_jean", "lower_tight_pants",
    "lower_black", "lower_white", "lower_gray", "lower_red", "lower_green",
    "lower_blue", "lower_silver", "lower_yellow", "lower_brown",
    "lower_purple", "lower_pink", "lower_orange", "lower_mix_color",
    "lower_other_color",
    "shoes_leather", "shoes_sport", "shoes_boot", "shoes_cloth",
    "shoes_shandle", "shoes_casual", "shoes_other", "shoes_black",
    "shoes_white", "shoes_gray", "shoes_red", "shoes_green", "shoes_blue",
    "shoes_silver", "shoes_yellow", "shoes_brown", "shoes_purple",
    "shoes_pink", "shoes_orange", "shoes_mix_color", "shoes_other_color",
    "accessory_backpack", "accessory_shoulderbag", "accessory_handbag",
    "accessory_waistbag", "accessory_box", "accessory_plasticbag",
    "accessory_paperbag", "accessory_cart", "accessory_kid",
    "accessory_other",
    "action_calling", "action_armstretching", "action_chatting",
    "action_gathering", "action_lying", "action_crouching",
    "action_running", "action_holdthing", "action_pushing",
    "action_pulling", "action_nipthing", "action_picking", "action_other",
    "view_angle_left", "view_angle_right", "view_angle_front",
    "view_angle_back",
    "occlusion_left", "occlusion_right", "occlusion_up", "occlusion_down",
    "occlusion_environment", "occlusion_accessory", "occlusion_object",
    "occlusion_other",
)

ATTRIBUTES = T.StructType(
    [T.StructField("tracklet_key", T.StringType())]
    + [T.StructField(name, T.FloatType()) for name in ATTRIBUTE_NAMES]
)

# --- Feature (alg/pedestrian/reid/Feature1024.java:27-106) ------------------

FEATURE = T.StructType(
    [
        T.StructField("tracklet_key", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

# --- Similarity graph (vpe/data/GraphDatabaseConnector.java:102-123) --------

SIMILARITY_EDGE = T.StructType(
    [
        T.StructField("node_a", T.StringType()),
        T.StructField("node_b", T.StringType()),
        T.StructField("similarity", T.FloatType()),
    ]
)

# --- TaskData envelope (vpe/ctrl/TaskData.java:33-142) ----------------------
# The per-message ExecutionPlan does NOT travel with the row (SURVEY §4);
# rows carry a task id, routing ports and a typed payload pointer only.

TASK_DATA = T.StructType(
    [
        T.StructField("task_id", T.StringType()),
        T.StructField("dest_ports", T.ArrayType(T.StringType())),
        # DataType enum (vpe/common/DataType.java:26-46)
        T.StructField("payload_type", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("tracklet_key", T.StringType()),
        # claim-check: large payloads live in tables; rows carry paths
        T.StructField("payload_url", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

# Kafka topic <-> data type (vpe/common/DataType.java:26-46)
DATA_TYPES: tuple[str, ...] = (
    "ATTRIBUTES",
    "COMMAND",
    "IDRANK",
    "TRACKLET",
    "TRACKLET_ID",
    "TRACKLET_ATTR",
    "URL",
    "FRAME_ARRAY",
    "WEBCAM_LOGIN_PARAM",
    "TERM_SIG",
    "NONE",
)

# --- Video catalog (FIXTURES.md §1; MessageHandlingApp.java:163-165) --------

VIDEO = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("camera_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("duration_s", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps_num", T.IntegerType()),
        T.StructField("fps_den", T.IntegerType()),
    ]
)

# Frame rows for the video-cutting source (vpe/data/DataManagingApp.java:160-217)
FRAME = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("fragment_id", T.IntegerType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_data", T.BinaryType()),
    ]
)
