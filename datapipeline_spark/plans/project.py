"""Project loading: YAML tree → validated ProjectDefinition.

Reference: services/project_definition.py loads project.yaml → sources/*.yaml,
streams/*.yaml, dataset.yaml, profiles/*.yaml once into a config snapshot;
`${name}` placeholders resolve against `project.globals`
(fixtures use `${start_time}` / `${end_time}`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml
from pydantic import TypeAdapter

from datapipeline_spark.plans.config import (
    DatasetConfig,
    ProfileConfig,
    ProjectConfig,
    SourceConfig,
    StreamConfig,
)

_PLACEHOLDER = re.compile(r"^\$\{([A-Za-z_][A-Za-z0-9_]*)\}$")
_INLINE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def interpolate(node: Any, globals_: dict[str, Any]) -> Any:
    """Substitute `${name}` placeholders. A string that is exactly one
    placeholder takes the global's native type; embedded placeholders
    stringify. Unknown names raise (fail-fast, like the reference's strict
    config validation)."""
    if isinstance(node, str):
        whole = _PLACEHOLDER.match(node)
        if whole:
            name = whole.group(1)
            if name not in globals_:
                raise KeyError(f"unknown global ${{{name}}}")
            return globals_[name]

        def sub(m: re.Match[str]) -> str:
            name = m.group(1)
            if name not in globals_:
                raise KeyError(f"unknown global ${{{name}}}")
            return str(globals_[name])

        return _INLINE.sub(sub, node)
    if isinstance(node, list):
        return [interpolate(v, globals_) for v in node]
    if isinstance(node, dict):
        return {k: interpolate(v, globals_) for k, v in node.items()}
    return node


def _load_yaml(path: Path) -> Any:
    with open(path, "r", encoding="utf-8") as fh:
        return yaml.safe_load(fh)


@dataclass
class ProjectDefinition:
    """Validated, interpolation-resolved snapshot of a project directory."""

    root: Path
    project: ProjectConfig
    sources: dict[str, SourceConfig] = field(default_factory=dict)
    streams: dict[str, StreamConfig] = field(default_factory=dict)
    dataset: DatasetConfig | None = None
    profiles: dict[str, ProfileConfig] = field(default_factory=dict)

    def data_path(self, rel: str) -> str:
        """Resolve a loader path against the project root (absolute paths and
        URL-style paths pass through)."""
        if rel.startswith(("/", "s3://", "s3a://", "hdfs://", "file://")):
            return rel
        return str((self.root / self.project.paths.data / rel).resolve())


def load_project(project_dir: str | Path) -> ProjectDefinition:
    root = Path(project_dir)
    project_yaml = root / "project.yaml"
    if not project_yaml.is_file():
        raise FileNotFoundError(f"no project.yaml under {root}")
    project = ProjectConfig.model_validate(_load_yaml(project_yaml))
    if project.schema_version != 3:
        raise ValueError(f"unsupported schema_version {project.schema_version}")
    g = project.globals

    definition = ProjectDefinition(root=root, project=project)

    sources_dir = root / project.paths.sources
    if sources_dir.is_dir():
        for f in sorted(sources_dir.glob("*.yaml")):
            cfg = SourceConfig.model_validate(interpolate(_load_yaml(f), g))
            if cfg.id in definition.sources:
                raise ValueError(f"duplicate source id {cfg.id!r}")
            definition.sources[cfg.id] = cfg

    streams_dir = root / project.paths.streams
    if streams_dir.is_dir():
        for f in sorted(streams_dir.glob("*.yaml")):
            cfg = StreamConfig.model_validate(interpolate(_load_yaml(f), g))
            if cfg.id in definition.streams:
                raise ValueError(f"duplicate stream id {cfg.id!r}")
            definition.streams[cfg.id] = cfg

    dataset_yaml = root / project.paths.dataset
    if dataset_yaml.is_file():
        definition.dataset = DatasetConfig.model_validate(
            interpolate(_load_yaml(dataset_yaml), g)
        )

    profiles_dir = root / project.paths.profiles
    if profiles_dir.is_dir():
        # files are "<cmd>.<name>.yaml"; "<cmd>.defaults.yaml" holds per-command
        # defaults merged beneath each profile of that command — profile values
        # win, mapping values (e.g. `output`) merge one level deep (reference
        # profiles/loader.py file layout + config/profiles/defaults.py)
        known_cmds = {"serve", "build", "inspect", "materialize"}
        defaults: dict[str, dict[str, Any]] = {}
        entries: list[tuple[str, str, dict[str, Any]]] = []
        for f in sorted(profiles_dir.glob("*.yaml")):
            parts = f.stem.split(".")
            if len(parts) != 2 or parts[0] not in known_cmds:
                raise ValueError(
                    f"profile file must be named <cmd>.<name>.yaml with cmd in "
                    f"{sorted(known_cmds)}: {f.name}"
                )
            cmd, name = parts
            payload = interpolate(_load_yaml(f), g) or {}
            if name == "defaults":
                defaults[cmd] = payload
            else:
                entries.append((cmd, name, payload))
        adapter = TypeAdapter(ProfileConfig)
        for cmd, name, payload in entries:
            merged: dict[str, Any] = dict(defaults.get(cmd, {}))
            for k, v in payload.items():
                if isinstance(v, dict) and isinstance(merged.get(k), dict):
                    merged[k] = {**merged[k], **v}
                else:
                    merged[k] = v
            declared = merged.setdefault("cmd", cmd)
            if declared != cmd:
                raise ValueError(
                    f"profile {f'{cmd}.{name}'} declares cmd={declared!r}"
                )
            merged["name"] = name
            definition.profiles[f"{cmd}.{name}"] = adapter.validate_python(merged)

    _validate_references(definition)
    return definition


def _validate_references(defn: ProjectDefinition) -> None:
    from datapipeline_spark.plans.config import (
        AlignFrom,
        BroadcastFrom,
        SourceFrom,
        StreamFrom,
    )

    for sid, stream in defn.streams.items():
        frm = stream.from_
        if isinstance(frm, SourceFrom):
            if frm.source not in defn.sources:
                raise ValueError(f"stream {sid}: unknown source {frm.source!r}")
        elif isinstance(frm, StreamFrom):
            if frm.stream not in defn.streams:
                raise ValueError(f"stream {sid}: unknown stream {frm.stream!r}")
        elif isinstance(frm, BroadcastFrom):
            for ref in (frm.stream, frm.broadcast):
                if ref not in defn.streams:
                    raise ValueError(f"stream {sid}: unknown stream {ref!r}")
        elif isinstance(frm, AlignFrom):
            for ref in frm.align:
                if ref not in defn.streams:
                    raise ValueError(f"stream {sid}: unknown stream {ref!r}")
    if defn.dataset is not None:
        for spec in [*defn.dataset.features, *defn.dataset.targets]:
            if spec.stream not in defn.streams:
                raise ValueError(
                    f"dataset entry {spec.id}: unknown stream {spec.stream!r}"
                )
