"""Closed-loop agent against a recorded-tick harness (no CARLA;
SURVEY.md §7 hard-part 7)."""
import numpy as np
import pytest

import jax

from helpers import make_test_cfg
from stp3_tpu.deploy.control import PIDController, RoutePlanner, control_pid


def test_pid_proportional():
    pid = PIDController(k_p=2.0, k_i=0.0, k_d=0.0)
    assert abs(pid.step(0.5) - 1.0) < 1e-6


def test_control_pid_straight_line():
    # waypoints straight ahead -> near-zero steer, positive throttle at rest
    wps = np.array([[0.0, 1.0], [0.0, 2.0], [0.0, 3.0], [0.0, 4.0]])
    steer, throttle, brake, meta = control_pid(
        wps, speed=0.0, turn_controller=PIDController(1.25, 0.75, 0.3, 40),
        speed_controller=PIDController(5.0, 0.5, 1.0, 40))
    assert abs(steer) < 1e-6
    assert throttle > 0
    assert not brake


def test_control_pid_brakes_when_overspeeding():
    wps = np.array([[0.0, 0.05], [0.0, 0.1], [0.0, 0.15], [0.0, 0.2]])
    steer, throttle, brake, _ = control_pid(
        wps, speed=10.0, turn_controller=PIDController(),
        speed_controller=PIDController())
    assert brake and throttle == 0.0


def test_route_planner_pops_reached_waypoints():
    rp = RoutePlanner(min_distance=1.0)
    # waypoints ~2.2 m apart; the planner returns the waypoint one ahead of
    # the nearest un-popped one, and pops waypoints within min_distance
    plan = [({'lat': 0.0, 'lon': 0.0}, 4),
            ({'lat': 2e-5, 'lon': 0.0}, 4),
            ({'lat': 4e-5, 'lon': 0.0}, 3),
            ({'lat': 6e-5, 'lon': 0.0}, 2)]
    rp.set_route(plan, gps=True)
    gps0 = (np.array([0.0, 0.0]) - rp.mean) * rp.scale
    _, cmd = rp.run_step(gps0)      # pops wp0 (at the start position)
    assert cmd == 3
    gps1 = (np.array([2e-5, 0.0]) - rp.mean) * rp.scale
    _, cmd2 = rp.run_step(gps1)     # pops wp1 -> target advances
    assert cmd2 == 2


@pytest.mark.slow
def test_agent_recorded_ticks(tmp_path):
    """Save a tiny checkpoint, then drive the harness agent through warm-up
    and planned ticks with synthetic sensor data."""
    from stp3_tpu.datas.synthetic import SyntheticDataset, collate
    from stp3_tpu.training import checkpoint as ckpt_lib
    from stp3_tpu.training.trainer import Trainer
    from carla_agent import STP3Agent

    cfg = make_test_cfg(BATCHSIZE=1)
    cfg.IMAGE.NAMES = ['A', 'B', 'C', 'D']       # agent rig has 4 cameras
    cfg.IMAGE.FINAL_DIM = (64, 64)
    cfg.PLANNING.GRU_STATE_SIZE = 2              # (8,8,16)->(1,1,2) flatten
    trainer = Trainer(cfg)
    ds = SyntheticDataset(cfg, n_samples=1)
    batch = collate([ds[0]])
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    path = ckpt_lib.save_checkpoint(str(tmp_path), 0, state.params,
                                    cfg_dict=cfg.convert_to_dict())

    agent = STP3Agent()
    agent.setup(path)
    plan = [({'lat': 0.0, 'lon': 0.0}, 4), ({'lat': 5e-4, 'lon': 0.0}, 3)]
    agent.set_global_plan(plan)

    rng = np.random.RandomState(0)
    controls = []
    for step in range(6):
        input_data = {
            key: (step, rng.randint(0, 255, (300, 400, 4), np.uint8))
            for key in ['rgb', 'rgb_left', 'rgb_right', 'rgb_rear']}
        input_data['gps'] = (step, np.array([step * 1e-6, 0.0, 0.0]))
        input_data['speed'] = (step, {'speed': 3.0})
        input_data['imu'] = (step, np.array([0.0] * 6 + [0.1]))
        controls.append(agent.run_step(input_data))
    # warm-up ticks emit zero control; later ticks emit real numbers
    assert controls[0] == {'steer': 0.0, 'throttle': 0.0, 'brake': 0.0}
    last = controls[-1]
    assert np.isfinite([last['steer'], last['throttle'], last['brake']]).all()
    assert -1.0 <= last['steer'] <= 1.0
    assert 0.0 <= last['throttle'] <= 0.75


@pytest.mark.slow
def test_agent_core_static_geometry_matches_dynamic():
    """AgentCore(static_geometry=True) produces the same controls as the
    dynamic-scatter incremental path (the rig is fixed, so the precomputed
    splat plan is exact; ops/static_splat.py)."""
    from stp3_tpu.datas.synthetic import SyntheticDataset, collate
    from stp3_tpu.deploy.agent_core import AgentCore
    from stp3_tpu.training.trainer import Trainer

    cfg = make_test_cfg(BATCHSIZE=1)
    cfg.IMAGE.NAMES = ['A', 'B', 'C', 'D']
    cfg.IMAGE.FINAL_DIM = (64, 64)
    cfg.PLANNING.GRU_STATE_SIZE = 2
    trainer = Trainer(cfg)
    ds = SyntheticDataset(cfg, n_samples=1)
    batch = collate([ds[0]])
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    params = {'params': jax.device_get(state.params)}

    rng = np.random.RandomState(7)
    frames = [{key: rng.randint(0, 255, (300, 400, 3), np.uint8)
               for key in ['rgb', 'rgb_left', 'rgb_right', 'rgb_rear']}
              for _ in range(cfg.TIME_RECEPTIVE_FIELD + 2)]

    outs = []
    for static in (False, True):
        core = AgentCore(cfg, params, warmup=False, incremental=True,
                         static_geometry=static)
        controls = []
        for t, fr in enumerate(frames):
            core.push_frame(fr, gps=np.array([t * 2.0, 0.0]), theta=0.0)
            if core.warmed_up:
                np.random.seed(13)  # sampler uses the module RNG
                controls.append(core.plan_step(
                    speed=3.0, command_value=4,
                    target_point=np.array([0.0, 5.0])))
        outs.append(controls)
    assert len(outs[0]) >= 1
    for (s0, t0, b0, m0), (s1, t1, b1, m1) in zip(outs[0], outs[1]):
        np.testing.assert_allclose(s1, s0, atol=1e-4)
        np.testing.assert_allclose(t1, t0, atol=1e-4)
        assert b0 == b1
