"""Analysis-result store — timestamped per-game results with latest-lookup.

Mirrors ``crawler/exporters/analysis_store.py:62-136``: each analysis run
saves a JSON snapshot under ``{base_dir}/{game_id}/analysis_YYYYMMDD_
HHMMSS.json``; ``get_latest_analysis`` resolves the newest by filename
sort and ``list_analyses`` enumerates history. Arrow tables from
``analyze_posts`` are serialized as row lists (timestamps to ISO strings)
so snapshots are plain JSON, dashboard-consumable.

The store holds per-RUN summaries (a few KB each), not per-post data —
driver-side file IO is the right shape at any scale.
"""

from __future__ import annotations

import glob
import json
import os
from datetime import date, datetime

import pyarrow as pa


def _jsonable(obj):
    if isinstance(obj, (datetime, date)):
        return obj.isoformat()
    if isinstance(obj, bytes):
        return obj.decode("utf-8", errors="replace")
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    return obj


def analysis_to_dict(analysis: dict) -> dict:
    """analyze_posts() result (dict of pa.Table) -> JSON-ready dict."""
    out = {}
    for key, tbl in analysis.items():
        if isinstance(tbl, pa.Table):
            out[key] = _jsonable(tbl.to_pylist())
        else:
            out[key] = _jsonable(tbl)
    return out


class AnalysisStore:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def _game_dir(self, game_id: str) -> str:
        return os.path.join(self.base_dir, game_id)

    @staticmethod
    def _filename(analyzed_at: datetime) -> str:
        return f"analysis_{analyzed_at.strftime('%Y%m%d_%H%M%S')}.json"

    def save_analysis(self, game_id: str, analysis: dict,
                      analyzed_at: datetime) -> str:
        game_dir = self._game_dir(game_id)
        os.makedirs(game_dir, exist_ok=True)
        path = os.path.join(game_dir, self._filename(analyzed_at))
        data = analysis_to_dict(analysis)
        data["analyzed_at"] = analyzed_at.isoformat()
        data["game_id"] = game_id
        with open(path, "w", encoding="utf-8") as f:
            json.dump(data, f, ensure_ascii=False, indent=2)
        return path

    def load_analysis(self, path: str) -> dict | None:
        if not os.path.exists(path):
            return None
        try:
            with open(path, encoding="utf-8") as f:
                return json.load(f)
        except (json.JSONDecodeError, ValueError):
            return None

    def list_analyses(self, game_id: str) -> list[str]:
        return sorted(glob.glob(
            os.path.join(self._game_dir(game_id), "analysis_*.json")))

    def get_latest_analysis(self, game_id: str) -> dict | None:
        files = self.list_analyses(game_id)
        return self.load_analysis(files[-1]) if files else None
