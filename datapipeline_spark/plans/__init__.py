"""Declarative plan layer: YAML project → validated config → DataFrame graph.

Mirrors the reference's config grammar (schema_version 3) but compiles to lazy
PySpark DataFrames instead of a generator runtime: Catalyst is the IR
(reference services/runtime_compiler.py:78-111 builds `Runtime.streams`; here
`compile_project` builds a dict of DataFrame builders).
"""

from datapipeline_spark.plans.config import (
    DatasetConfig,
    ProjectConfig,
    SourceConfig,
    StreamConfig,
)
from datapipeline_spark.plans.project import ProjectDefinition, load_project
from datapipeline_spark.plans.compiler import CompiledProject, compile_project

__all__ = [
    "CompiledProject",
    "DatasetConfig",
    "ProjectConfig",
    "ProjectDefinition",
    "SourceConfig",
    "StreamConfig",
    "compile_project",
    "load_project",
]
