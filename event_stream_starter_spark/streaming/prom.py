"""Prometheus v0.0.4 text exposition for the /metrics read path
(SURVEY.md §2.13; reference api/routes/metrics.py:116-180 and
api/core/metrics_exporter.py:66-160).

Laws mirrored from the reference exporter:
- ``pipeline_latency_ms`` is ALWAYS emitted as a histogram with the
  fixed buckets [50, 100, 200, 500, 1000, 2000, 5000] + ``+Inf``, plus
  ``_sum`` and ``_count`` — even when empty (metrics_exporter.py:85-110);
- every other metric gets ``# HELP`` / ``# TYPE`` annotations and a
  ``0`` placeholder when it has no value (metrics_exporter.py:113-128);
- a standard-metrics tail guarantees dashboards never see absent series
  (metrics_exporter.py:130-160); engine analogs keep the reference's
  names where the concept maps 1:1 (outbox_backlog, config_version,
  config_last_success_unixtime, up, build_info) and drop the
  transport-specific ones (telegram_*) in favor of engine counters;
- the endpoint is gated by ``METRICS_EXPOSED`` (routes/metrics.py:126);
  ungated calls return None — the engine analog of the 404.
"""

from __future__ import annotations

import os

LATENCY_BUCKETS = (50, 100, 200, 500, 1000, 2000, 5000)

# (name, type, help) — emitted with value 0 when not provided, so the
# scrape surface is stable from the first request.
STANDARD_METRICS = (
    ("hf_degrade_count", "counter", "Model-backend degrade count"),
    ("outbox_backlog", "gauge", "Push outbox backlog size"),
    ("cards_degrade_count", "counter", "Total number of degraded events"),
    ("config_reload_total", "counter", "Total number of config reloads"),
    ("config_reload_errors_total", "counter", "Total number of config reload errors"),
    ("config_version", "gauge", "Current config version"),
    (
        "config_last_success_unixtime",
        "gauge",
        "Unix timestamp of last successful config reload",
    ),
    ("up", "gauge", "1 if metrics handler is healthy"),
    ("build_info", "gauge", "Build information"),
)


def metrics_exposed() -> bool:
    """routes/metrics.py:126 — read the gate dynamically per request."""
    return os.getenv("METRICS_EXPOSED", "false").lower() == "true"


def _escape_label(v: str) -> str:
    """Prometheus text-format label escaping (\\ -> \\\\, \" -> \\\",
    newline -> \\n) — an unescaped quote in e.g. BUILD_VERSION would
    make the scraper reject the ENTIRE scrape, not one series."""
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt_labels(labels: dict[str, str] | None) -> str:
    if not labels:
        return ""
    inner = ",".join(
        f'{k}="{_escape_label(str(v))}"' for k, v in sorted(labels.items())
    )
    return "{" + inner + "}"


def build_prom_text(
    latency_samples_ms: list[int] | None = None,
    gauges: dict[str, float] | None = None,
    counters: dict[str, float] | None = None,
    labeled: dict[str, tuple[dict[str, str], float]] | None = None,
    help_text: dict[str, str] | None = None,
) -> str:
    """Render the exposition body. ``gauges``/``counters`` map name →
    value; ``labeled`` maps name → (labels, value) for one-off labeled
    series like build_info."""
    samples = latency_samples_ms or []
    gauges = dict(gauges or {})
    counters = dict(counters or {})
    labeled = dict(labeled or {})
    helps = dict(help_text or {})

    lines: list[str] = []
    lines.append(
        "# HELP pipeline_latency_ms Latency histogram of pipeline in milliseconds"
    )
    lines.append("# TYPE pipeline_latency_ms histogram")
    for b in LATENCY_BUCKETS:
        count = sum(1 for s in samples if s <= b)
        lines.append(f'pipeline_latency_ms_bucket{{le="{b}"}} {count}')
    lines.append(f'pipeline_latency_ms_bucket{{le="+Inf"}} {len(samples)}')
    lines.append(f"pipeline_latency_ms_sum {sum(samples) if samples else 0}")
    lines.append(f"pipeline_latency_ms_count {len(samples)}")

    std_types = {n: t for n, t, _ in STANDARD_METRICS}
    std_help = {n: h for n, _, h in STANDARD_METRICS}

    def emit(name: str, mtype: str, value: float, labels: dict | None = None) -> None:
        lines.append("")
        lines.append(f"# HELP {name} {helps.get(name, std_help.get(name, name))}")
        lines.append(f"# TYPE {name} {mtype}")
        v = int(value) if float(value).is_integer() else value
        lines.append(f"{name}{_fmt_labels(labels)} {v}")

    seen: set[str] = set()
    for name, value in counters.items():
        emit(name, "counter", value)
        seen.add(name)
    for name, value in gauges.items():
        emit(name, std_types.get(name, "gauge"), value)
        seen.add(name)
    for name, (labels, value) in labeled.items():
        emit(name, std_types.get(name, "gauge"), value, labels)
        seen.add(name)
    for name, mtype, _ in STANDARD_METRICS:
        if name not in seen:
            emit(name, mtype, 0)
    return "\n".join(lines) + "\n"
