"""Game profiles — multi-tenancy surface of the reference.

Mirrors ``crawler/models/game_profile.py:15-183``: a profile per game
(id, display name, search keywords, target sites) plus per-game output
directory conventions (``data/{game_id}``, ``quicksight_data/{game_id}``),
and a manager for register/lookup/path/ensure-dirs. The Ray pipelines
thread ``game_id`` through export prefixes so one cluster can serve many
games with isolated, resumable output trees.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class GameProfile:
    game_id: str
    game_name: str
    keywords: list[str] = field(default_factory=list)
    target_sites: list[str] = field(default_factory=list)
    data_dir: str = ""
    quicksight_dir: str = ""

    def __post_init__(self):
        if not self.game_id or not self.game_id.strip():
            raise ValueError("game_id must not be empty")
        if not self.game_name or not self.game_name.strip():
            raise ValueError("game_name must not be empty")
        if not self.data_dir:
            self.data_dir = f"data/{self.game_id}"
        if not self.quicksight_dir:
            self.quicksight_dir = f"quicksight_data/{self.game_id}"

    def to_dict(self) -> dict:
        return {
            "game_id": self.game_id,
            "game_name": self.game_name,
            "keywords": list(self.keywords),
            "target_sites": list(self.target_sites),
            "data_dir": self.data_dir,
            "quicksight_dir": self.quicksight_dir,
        }

    @classmethod
    def from_dict(cls, data: dict) -> "GameProfile":
        return cls(
            game_id=data["game_id"],
            game_name=data["game_name"],
            keywords=list(data.get("keywords", [])),
            target_sites=list(data.get("target_sites", [])),
            data_dir=data.get("data_dir", ""),
            quicksight_dir=data.get("quicksight_dir", ""),
        )


class GameProfileManager:
    """Register/lookup profiles and resolve per-game output paths
    (game_profile.py:82-183)."""

    def __init__(self, base_data_dir: str = "data",
                 base_quicksight_dir: str = "quicksight_data"):
        self.profiles: dict[str, GameProfile] = {}
        self.base_data_dir = base_data_dir
        self.base_quicksight_dir = base_quicksight_dir

    def register_game(self, profile: GameProfile) -> None:
        self.profiles[profile.game_id] = profile

    def get_profile(self, game_id: str) -> GameProfile | None:
        return self.profiles.get(game_id)

    def get_data_path(self, game_id: str) -> str:
        p = self.profiles.get(game_id)
        return p.data_dir if p else os.path.join(self.base_data_dir, game_id)

    def get_quicksight_path(self, game_id: str) -> str:
        p = self.profiles.get(game_id)
        return p.quicksight_dir if p else os.path.join(
            self.base_quicksight_dir, game_id)

    def list_games(self) -> list[GameProfile]:
        return list(self.profiles.values())

    def remove_game(self, game_id: str) -> bool:
        return self.profiles.pop(game_id, None) is not None

    def ensure_directories(self, game_id: str) -> None:
        os.makedirs(self.get_data_path(game_id), exist_ok=True)
        os.makedirs(self.get_quicksight_path(game_id), exist_ok=True)
