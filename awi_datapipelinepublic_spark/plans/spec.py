"""Pipeline specification: YAML multi-doc → typed PipelineSpec.

The reference drives everything from ``settings.yaml``: one YAML doc
per data type carrying the schema pointer, bucket URIs, converter map,
merge date column, and view SQL (settings.yaml:1-141, resolved by name
at config.py:44-52 with a substring-match special case for the Excel
type at config.py:48-49). This module is the typed, eval-free
equivalent; the spec drives the Spark runner exactly as the YAML doc
drives the Cloud Functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

try:
    import yaml
except ImportError:  # pragma: no cover — pyyaml is optional; specs can be built in code
    yaml = None


@dataclass
class PipelineSpec:
    """Everything needed to run one data type end to end."""

    name: str                                   # data-type name (settings.yaml: 'name')
    schema_file: str                            # BQ-JSON schema path ('jsonfile')
    date_col: str                               # merge-cutoff column ('date_col')
    landing_dir: str                            # raw file drop dir (bucket 'uri1' analog)
    staging_dir: str                            # cleaned staging dir ('uri2' analog)
    base_table_path: str                        # merged historical table ('old_table')
    converters: dict[str, str] = field(default_factory=dict)   # col → converter name
    excel_sheets: list[str] = field(default_factory=list)      # non-empty → Excel branch
    excel_filename_marker: str = ""             # route_source substring (config.py:108)
    view_name: str = ""                         # analytical view to refresh
    error_dir: str = ""                         # quarantine dir (failed_func analog)

    @property
    def is_excel(self) -> bool:
        return bool(self.excel_sheets)


def load_specs(path: str | Path) -> dict[str, PipelineSpec]:
    """Parse a multi-doc YAML settings file into specs keyed by name."""
    if yaml is None:
        raise NotImplementedError("pyyaml not available; construct PipelineSpec directly")
    specs: dict[str, PipelineSpec] = {}
    with open(path) as f:
        for doc in yaml.safe_load_all(f):
            if not doc:
                continue
            spec = PipelineSpec(
                name=doc["name"],
                schema_file=doc["schema_file"],
                date_col=doc["date_col"],
                landing_dir=doc["landing_dir"],
                staging_dir=doc["staging_dir"],
                base_table_path=doc["base_table_path"],
                converters=doc.get("converters", {}) or {},
                excel_sheets=doc.get("excel_sheets", []) or [],
                excel_filename_marker=doc.get("excel_filename_marker", ""),
                view_name=doc.get("view_name", ""),
                error_dir=doc.get("error_dir", ""),
            )
            specs[spec.name] = spec
    return specs


def resolve_spec(specs: dict[str, PipelineSpec], filename: str) -> PipelineSpec:
    """Route a dropped file to its spec (reference route_source,
    config.py:44-52): exact name match on the data type derived from
    the filename stem, else the Excel substring marker."""
    stem = Path(filename).stem
    if stem in specs:
        return specs[stem]
    for spec in specs.values():
        if spec.excel_filename_marker and spec.excel_filename_marker in filename:
            return spec
    raise KeyError(f"no pipeline spec matches file {filename!r}")
