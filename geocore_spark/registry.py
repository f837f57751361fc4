"""Layer registries + config-driven dataset assembly.

The reference wires everything through fvcore registries
(FEATURES_REGISTRY / LABEL_REGISTRY / TEST_REGISTRY,
/root/reference/modeling/datasets/build.py:18-26) selected by YAML config
(experiment_configs/*.yaml), and ``build_dataset`` (build.py:288-416)
assembles: materialize layers -> N-way join -> label merge -> test flags ->
buffer mask -> train/application split.

Here registries are plain dicts of DataFrame-producing functions and
``build_dataset`` is the same orchestration over the engine's operators —
one Catalyst plan instead of generated SQL, same output contract
(features + label + is_test + meta columns).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geocore_spark.functions import tiling as tl
from geocore_spark.operators import assembly

LayerFn = Callable[[SparkSession], DataFrame]

FEATURES_REGISTRY: dict[str, LayerFn] = {}
LABEL_REGISTRY: dict[str, LayerFn] = {}
TEST_REGISTRY: dict[str, LayerFn] = {}


def register(registry: dict[str, LayerFn], name: str):
    def deco(fn: LayerFn) -> LayerFn:
        if name in registry:
            raise ValueError(f"duplicate layer name: {name}")
        registry[name] = fn
        return fn

    return deco


@dataclass
class DatasetConfig:
    """Mirror of the YAML experiment config's dataset block
    (experiment_configs/lightgbm_gbdt_model_ingenious.yaml:3-16)."""

    features: list[str]
    labels: list[str]
    tests: list[str] = field(default_factory=list)
    buffer_km: float | None = None
    index_col: str = "cell"
    #: columns to treat as categorical in the emitted dataset — the
    #: reference's optional pandas ``category`` cast driven by config
    #: (build.py:393-395, defaults at modeling/config/defaults.py:39).
    #: Spark has no category dtype; the equivalent contract is a STRING
    #: column (downstream ML indexers consume strings), so listed columns
    #: are cast to string.
    categorical: list[str] = field(default_factory=list)


def load_config(path: str) -> DatasetConfig:
    """YAML experiment config -> DatasetConfig — the reference's config
    surface (experiment_configs/*.yaml; dataset block keys features /
    labels / tests / buffer_km / index_col). Unknown keys are ignored so
    model/training blocks can coexist in the same file, as they do in
    the reference's configs."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    ds = raw.get("dataset", raw)
    return DatasetConfig(
        features=list(ds["features"]),
        labels=list(ds["labels"]),
        tests=list(ds.get("tests", []) or []),
        buffer_km=ds.get("buffer_km"),
        index_col=ds.get("index_col", "cell"),
        categorical=list(ds.get("categorical", []) or []),
    )


def build_dataset(
    spark: SparkSession, cfg: DatasetConfig
) -> tuple[DataFrame, DataFrame]:
    """Assemble (train, application) exactly like build.py:288-416.

    1. resolve layer names through the registries (duplicate-name check,
       build.py:306-316);
    2. guards: unique index per layer, uniform resolution (base.py:82-99,
       build.py:330-341);
    3. N-way left join anchored on the first feature layer (J1);
    4. merged labels left-joined on the index (U1+W1);
    5. union-distinct test cells -> is_test flag (U2+J2);
    6. optional buffer masking of train labels near test cells (G7+J3);
    7. split on label null-ness (P5).
    """
    if len(set(cfg.features)) != len(cfg.features) or len(set(cfg.labels)) != len(
        cfg.labels
    ):
        raise assembly.BadTable("duplicate feature/label names in config")
    missing = [n for n in cfg.features if n not in FEATURES_REGISTRY]
    missing += [n for n in cfg.labels if n not in LABEL_REGISTRY]
    missing += [n for n in cfg.tests if n not in TEST_REGISTRY]
    if missing:
        raise KeyError(f"unregistered layers: {missing}")

    feature_layers = [FEATURES_REGISTRY[n](spark) for n in cfg.features]
    wide = assembly.join_features(feature_layers, cfg.index_col)

    labels = assembly.merge_labels([LABEL_REGISTRY[n](spark) for n in cfg.labels])
    wide = wide.join(
        labels.withColumnRenamed("cell", cfg.index_col), cfg.index_col, "left"
    )

    if cfg.tests:
        test_cells = None
        for n in cfg.tests:
            t = TEST_REGISTRY[n](spark).select(F.col(cfg.index_col))
            test_cells = t if test_cells is None else test_cells.unionByName(t)
        wide = assembly.flag_test_cells(wide, test_cells.distinct(), cfg.index_col)
    else:
        wide = wide.withColumn("is_test", F.lit(0))

    if cfg.buffer_km and cfg.tests:
        ctr = tl.cell_to_latlng(F.col(cfg.index_col))
        pts = wide.withColumn("lat", ctr["lat"]).withColumn("lon", ctr["lon"])
        test_pts = (
            pts.filter(F.col("is_test") == 1).select("lat", "lon").distinct()
        )
        wide = assembly.mask_bad_train(pts, test_pts, cfg.buffer_km).drop("lat", "lon")

    for c in cfg.categorical:
        if c not in wide.columns:
            raise KeyError(f"categorical column not in dataset: {c}")
        wide = wide.withColumn(c, F.col(c).cast("string"))

    feature_cols = [
        c
        for c in wide.columns
        if c not in (cfg.index_col, "label", "weight", "type", "is_test")
    ]
    assembly.assert_no_meta_leak(feature_cols)
    train = wide.filter(F.col("label").isNotNull() & (F.col("is_test") == 0))
    application = wide.filter(F.col("label").isNull())
    return train, application
