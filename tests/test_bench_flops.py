"""bench.py FLOPs/MFU accounting — the perf contract's compute denominator.

Pins the analytic matmul-FLOPs formulas against hand-computed cases and the
sphere headline config (whose ~99 MFLOP/step is the number PARITY.md §6
quotes an MFU against).
"""

from types import SimpleNamespace

import bench


def test_mlp_step_flops_hand_case():
    # enc (4 -> 5 -> 3), dec (3 -> 5 -> 4), batch 10:
    # fwd enc = 2*10*(4*5 + 5*3) = 700; dec = 2*10*(3*5 + 5*4) = 700
    # training multiplier 3 -> 4200
    assert bench.mlp_step_flops(10, 4, 3, (5, 3), (5, 4), dual=False) == 4200
    # the sigmoid dual decoder doubles the decoder stack only
    assert bench.mlp_step_flops(10, 4, 3, (5, 3), (5, 4), dual=True) == \
        3 * (700 + 2 * 700)


def test_mlp_step_flops_sphere_headline():
    # sphere sweep row 1: batch 100, ambient 6, latent 6, 200^3 MLPs
    # (features include the final projection, models/networks.py)
    feats = (200, 200, 200, 6)
    fl = bench.mlp_step_flops(100, 6, 6, feats, feats, dual=False)
    per_net = 2 * 100 * (6 * 200 + 200 * 200 + 200 * 200 + 200 * 6)
    assert fl == 3 * 2 * per_net
    assert 90e6 < fl < 110e6  # ~99 MFLOP/step — the PARITY §6 denominator


def test_conv_step_flops_hand_case():
    # image (4,4,1), channels (2,), latent 3, batch 1:
    # enc Conv 3x3 s2 -> (2,2,2): 2*1*2*2*9*1*2 = 144; FCmu 8->3: 48
    # dec FCin 3->8: 48; UpOut (2,2,2)->(4,4,1): 2*1*2*2*9*2*1 = 144
    # fwd = 384, training x3 = 1152
    assert bench.conv_step_flops(1, (4, 4, 1), 3, (2,)) == 1152


def test_workload_flops_solo_and_grid_plumbing():
    model = SimpleNamespace(encoder_features=(5, 3), decoder_features=(5, 4),
                            dual_sigmoid_decoder=False, latent_dim=3)
    solo = SimpleNamespace(model=model,
                           dataset=SimpleNamespace(dimension=4),
                           cfg=SimpleNamespace(batch_size=10))
    assert bench.workload_flops_per_step("linear", solo) == 4200

    g = SimpleNamespace(model=model, data_dim=4, latent_dim=3,
                        cfg=SimpleNamespace(batch_size=10), seeds=[1, 2, 3])
    grid = SimpleNamespace(groups=[g, g])
    # aggregate row-steps: average per row-step = the per-row cost
    assert bench.workload_flops_per_step("grid_linear", grid) == 4200
