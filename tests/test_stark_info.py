"""StarkInfo loader on a synthesized reference-format fixture."""

import json

from xlayer_prover_tpu.stark.stark_info import StarkInfo


FIXTURE = {
    "starkStruct": {
        "nBits": 23, "nBitsExt": 24, "nQueries": 32,
        "verificationHashType": "GL",
        "steps": [{"nBits": 24}, {"nBits": 19}, {"nBits": 14},
                  {"nBits": 9}, {"nBits": 4}],
    },
    "mapTotalN": 1000000,
    "nConstants": 61, "nPublics": 44,
    "nCm1": 751, "nCm2": 6, "nCm3": 18, "nCm4": 6,
    "qDeg": 2, "qDim": 3,
    "mapSectionsN": {"cm1_n": 751, "cm2_n": 6, "cm3_n": 18, "cm4_n": 6,
                     "q_2ns": 3, "f_2ns": 3},
    "mapDeg": {"cm1_n": 8388608, "cm1_2ns": 16777216},
    "mapOffsets": {"cm1_n": 0, "cm2_n": 6291456},
    "cm_n": [0, 1, 2], "cm_2ns": [3, 4, 5], "qs": [6, 7],
    "puCtx": [{"fExpId": 10, "tExpId": 11, "h1Id": 12, "h2Id": 13,
               "zId": 14, "c1Id": 15, "c2Id": 16, "numId": 17, "denId": 18}],
    "peCtx": [{"fExpId": 20, "tExpId": 21, "zId": 22, "c1Id": 23,
               "c2Id": 24, "numId": 25, "denId": 26}],
    "ciCtx": [{"zId": 30, "numId": 31, "denId": 32}],
    "evMap": [{"type": "cm", "id": 0, "prime": False},
              {"type": "cm", "id": 0, "prime": True},
              {"type": "const", "id": 3, "prime": False},
              {"type": "q", "id": 0, "prime": False}],
    "step42ns": {"first": [{"op": "mul", "dest": {"type": "tmp", "id": 0},
                            "src": [{"type": "cm", "id": 1},
                                    {"type": "challenge", "id": 4}]}]},
}


def test_load_fixture(tmp_path):
    path = tmp_path / "test.starkinfo.json"
    path.write_text(json.dumps(FIXTURE))
    si = StarkInfo.load(str(path))
    assert si.stark_struct.n_bits == 23
    assert si.fri_steps() == [24, 19, 14, 9, 4]
    assert si.n_cm1 == 751
    assert si.map_sections_n["cm1_n"] == 751
    assert si.pu_ctx[0].h1_id == 12
    assert si.pe_ctx[0].num_id == 25
    assert si.ci_ctx[0].z_id == 30
    assert [e.prime for e in si.ev_map] == [False, True, False, False]
    assert si.steps["step42ns"][0].op == "mul"
    assert si.q_deg == 2


def test_memory_plan_consumer():
    """StarkInfo feeds the HBM section planner (the reference's 51 GB
    buffer map, commit_pols.hpp:1735-1737, becomes a per-device plan)."""
    from xlayer_prover_tpu.stark.stark_info import StarkInfo, memory_plan
    si = StarkInfo.from_json({
        "starkStruct": {"nBits": 23, "nBitsExt": 24, "nQueries": 32,
                        "steps": [{"nBits": 24}, {"nBits": 19}]},
        "nConstants": 100, "nPublics": 44,
        "nCm1": 751, "nCm2": 6, "nCm3": 42, "nCm4": 12,
        "mapSectionsN": {"cm1_n": 751, "cm1_2ns": 751, "cm2_n": 6,
                         "cm2_2ns": 6, "q_2ns": 12},
    })
    plan = memory_plan(si, n_devices=1)
    # the zkevm cm1 section alone is the reference's 50.4 GB trace / +ext
    assert plan["sections"]["cm1_n"]["bytes"] == 751 * (1 << 23) * 8
    assert not plan["hbm_resident"]
    assert plan["stream_block_cols"] >= 8
    plan8 = memory_plan(si, n_devices=8)
    assert plan8["per_device_bytes"] < plan["per_device_bytes"]


def test_memory_plan_reference_geometry_pod_slice():
    """The FULL reference geometry — 751 executor pols x 2^23 rows
    (commit_pols.hpp:1735-1737) plus this framework's measured
    chains-bound cm2/cm3 widths — through the planner: a single 16 GB
    chip must stream column blocks; a v5e-64 pod slice holds every
    section HBM-resident, which is the production sharding this design
    targets (SURVEY §2.7 P7)."""
    from xlayer_prover_tpu.stark.stark_info import StarkInfo, memory_plan
    si = StarkInfo.from_json({
        "starkStruct": {"nBits": 23, "nBitsExt": 24, "nQueries": 64,
                        "steps": [{"nBits": 24}, {"nBits": 19},
                                  {"nBits": 14}]},
        "nConstants": 361, "nPublics": 44,
        "mapSectionsN": {
            # committed widths measured on this framework's own
            # chains-bound zkevm AIR (PROOF_2e18_chains.json), scaled to
            # the reference's 2^23 trace domain
            "const_n": 361, "const_2ns": 361,
            "cm1_n": 751, "cm1_2ns": 751,
            "cm2_n": 600, "cm2_2ns": 600,
            "cm3_n": 999, "cm3_2ns": 999,
            "q_2ns": 6,
        },
    })
    one = memory_plan(si, n_devices=1)
    # ~680 GB total: half a TB of sections cannot be chip-resident
    assert one["total_bytes"] > 500 << 30
    assert not one["hbm_resident"]
    # the streaming block must fit 3 working copies of the worst
    # section's rows inside half the HBM
    worst_rows = 1 << 24
    assert one["stream_block_cols"] * worst_rows * 8 * 3 <= 8 << 30
    # a v5e-64 slice (16 GB/chip) holds everything resident
    pod = memory_plan(si, n_devices=64)
    assert pod["per_device_bytes"] <= int((16 << 30) * 0.75)
    assert pod["hbm_resident"]
    # v5p single host (8 x 95 GB) also resident
    v5p = memory_plan(si, n_devices=8, hbm_bytes=95 << 30)
    assert v5p["hbm_resident"]
