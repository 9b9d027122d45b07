"""Placeholder — replaced by the full compiler-backed engine."""


class MapperEngine:  # pragma: no cover - stub
    pass
