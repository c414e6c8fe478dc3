"""Beacon-RPC ingestion tests: the main.rs:34-56 fetch flow against a
local mocked HTTP server serving beacon-API-format JSON derived from
the reference mainnet fixtures.  Asserts the fetched update pair
produces the exact same witness assembly as loading the fixture files
directly (so live ingestion and offline fixtures are interchangeable
inputs to the circuit)."""

import http.server
import json
import threading

import pytest

from eth_lc_plonky2_tpu.cli import witness_from_updates
from eth_lc_plonky2_tpu.eth import rpc as rpcm
from eth_lc_plonky2_tpu.eth.lc_update import load_update

FIXTURES = "/root/reference/eth-lc-plonky2/src/light_client_update_period_{}.json"


def _fixture_to_beacon_api(path: str) -> dict:
    """Reference-fixture schema -> standard beacon-API update schema
    (the inverse of the rainbow-bridge parsing utils.rs:128-227 does)."""
    with open(path) as f:
        d = json.load(f)

    def header(h):
        return {"beacon": h}

    return {
        "version": "capella",
        "data": {
            "attested_header": header(d["attested_beacon_header"]),
            "next_sync_committee": d["sync_committee_update"]["next_sync_committee"],
            "next_sync_committee_branch": d["sync_committee_update"]["next_sync_committee_branch"],
            "finalized_header": header(d["finality_update"]["header_update"]["beacon_header"]),
            "finality_branch": d["finality_update"]["finality_branch"],
            "sync_aggregate": d["sync_aggregate"],
            "signature_slot": d["signature_slot"],
        },
    }


@pytest.fixture(scope="module")
def updates():
    return [_fixture_to_beacon_api(FIXTURES.format(p)) for p in ("633", "634")]


def test_update_from_beacon_api_matches_fixture_loader(updates):
    for period, api in zip(("633", "634"), updates):
        want = load_update(FIXTURES.format(period))
        got = rpcm.update_from_beacon_api(api)
        assert got == want


def test_flat_header_version_accepted(updates):
    """The utils.rs:25-41 version switch: un-nested headers parse too."""
    d = json.loads(json.dumps(updates[0]["data"]))
    d["attested_header"] = d["attested_header"]["beacon"]
    d["finalized_header"] = d["finalized_header"]["beacon"]
    got = rpcm.update_from_beacon_api(d)
    assert got == load_update(FIXTURES.format("633"))


def test_fetch_update_pair_over_http(updates, tmp_path):
    """Full main.rs:34-56 flow against a local HTTP server."""
    attested_slot = int(
        updates[1]["data"]["attested_header"]["beacon"]["slot"]
    )
    period = attested_slot // rpcm.SLOTS_PER_PERIOD
    finality_payload = {
        "version": "capella",
        "data": {"attested_header": updates[1]["data"]["attested_header"]},
    }

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/finality_update"):
                body = finality_payload
            elif self.path.startswith("/updates"):
                assert f"start_period={period - 1}" in self.path and "count=2" in self.path
                body = updates
            else:
                self.send_error(404)
                return
            data = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host = f"http://127.0.0.1:{srv.server_address[1]}"
        yaml = tmp_path / "rpc.yaml"
        yaml.write_text(
            f"finality_update_rpc: {host}/finality_update\n"
            f"light_client_rpc: {host}/updates\n"
        )
        cfg = rpcm.load_rpc_config(str(yaml))
        cur_u, new_u = rpcm.fetch_update_pair(cfg)
    finally:
        srv.shutdown()

    # the fetched pair assembles the exact same witness as the fixtures
    want_kwargs, want_cur, want_new = witness_from_updates(
        load_update(FIXTURES.format("633")), load_update(FIXTURES.format("634"))
    )
    got_kwargs, got_cur, got_new = witness_from_updates(cur_u, new_u)
    assert got_cur == want_cur and got_new == want_new
    assert got_kwargs.keys() == want_kwargs.keys()
    for k in want_kwargs:
        assert got_kwargs[k] == want_kwargs[k], k
