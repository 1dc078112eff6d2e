"""Test configuration.

Device tests run on a virtual 8-device CPU mesh so sharding logic is exercised
without TPU hardware (the driver separately dry-runs the multi-chip path).
Must set XLA flags before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override: the shell may preset "axon"
# small device chunks: keeps CPU-backend compiles fast in tests
os.environ.setdefault("JTOKKIT_TPU_CHUNK", str(1 << 17))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize imports jax (registering the axon TPU
# plugin) before this file runs, so the env vars above may be too late —
# force the settings through the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import ast
import csv

import pytest


def load_conformance_rows(enc_name: str):
    """Rows of the golden conformance CSV: (input, tokens, tokens_max10)."""
    path = os.path.join(
        os.path.dirname(__file__), "data", f"{enc_name}_encodings.csv"
    )
    rows = []
    with open(path, newline="") as f:
        # The fixtures use ", " separators, which JUnit's @CsvFileSource trims
        for r in csv.DictReader(f, skipinitialspace=True):
            rows.append(
                (
                    r["input"],
                    ast.literal_eval(r["output"]),
                    ast.literal_eval(r["outputMaxTokens10"]),
                )
            )
    return rows


ENCODING_NAMES = ["r50k_base", "p50k_base", "p50k_edit", "cl100k_base"]


@pytest.fixture(scope="session", params=ENCODING_NAMES)
def enc_name(request):
    return request.param
