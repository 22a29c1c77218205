"""Minimal robots.txt handling (NEW capability — absent in the reference,
required by the north rule; cached per host inside each frontier shard).

Supports the subset that matters for a crawler: ``User-agent`` groups,
``Disallow`` / ``Allow`` prefix rules with longest-match precedence,
``Crawl-delay``. ``*`` matches any agent; rules for the most specific
matching agent group apply.
"""

from __future__ import annotations


class RobotsRules:
    def __init__(self, disallow: list[str], allow: list[str], crawl_delay: float | None):
        self.disallow = disallow
        self.allow = allow
        self.crawl_delay = crawl_delay

    def allowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        for rule in self.disallow:
            if rule and path.startswith(rule) and len(rule) > best_len:
                best_len, best_allow = len(rule), False
        for rule in self.allow:
            if rule and path.startswith(rule) and len(rule) >= best_len:
                best_len, best_allow = len(rule), True
        return best_allow


ALLOW_ALL = RobotsRules([], [], None)


def parse_robots(text: str, agent: str = "*") -> RobotsRules:
    groups: dict[str, dict[str, list]] = {}
    current_agents: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(value.lower())
            groups.setdefault(value.lower(), {"disallow": [], "allow": [], "delay": []})
            last_was_agent = True
            continue
        last_was_agent = False
        for a in current_agents:
            g = groups.get(a)
            if g is None:
                continue
            if key == "disallow":
                g["disallow"].append(value)
            elif key == "allow":
                g["allow"].append(value)
            elif key == "crawl-delay":
                try:
                    g["delay"].append(float(value))
                except ValueError:
                    pass
    chosen = None
    agent_l = agent.lower()
    for name, g in groups.items():
        if name != "*" and (agent_l.startswith(name) or name in agent_l):
            chosen = g
            break
    if chosen is None:
        chosen = groups.get("*")
    if chosen is None:
        return ALLOW_ALL
    delay = chosen["delay"][0] if chosen["delay"] else None
    return RobotsRules(chosen["disallow"], chosen["allow"], delay)
