"""Interactive deploy surfaces, exercised headlessly with injected fakes.

Covers deploy/viewer.py (VERDICT r3 missing #1/#3): the mujoco.viewer
keyboard-teleop semantics (reference mujoco_infer.py:105-154), the dual
pygame joystick mapping (reference ref_motion_viewer.py:141-161), the
passive-viewer policy loop, and the live gait-viewer loop. On a
workstation the same code drives the real window/sticks.
"""

import numpy as np

from open_duck_playground_tpu.deploy.viewer import (
    COMMANDS_RANGE_THETA,
    COMMANDS_RANGE_X,
    COMMANDS_RANGE_Y,
    NECK_PITCH_RANGE,
    PygameJoystickTeleop,
    ViewerKeyTeleop,
    run_viewer,
)


class _Host:
    def __init__(self):
        self.commands = [0.0] * 7
        self.phase_frequency_factor = 1.0
        self.sim_dt = 0.002
        self.decimation = 10
        self.model = object()
        self.data = object()
        self.saved_obs = []
        self.stepped = 0

    def control_step(self):
        self.saved_obs.append(np.zeros(3))
        return np.zeros(14)

    def step_control(self, targets):
        self.stepped += 1


def test_key_teleop_reference_semantics():
    host = _Host()
    cb = ViewerKeyTeleop(host)
    cb(265)  # arrow up -> vx max
    assert host.commands[0] == COMMANDS_RANGE_X[1]
    cb(263)  # arrow left -> vy max, AND vx resets to 0 (reference rebuilds)
    assert host.commands[1] == COMMANDS_RANGE_Y[1]
    assert host.commands[0] == 0.0
    cb(81)  # a -> wz max
    assert host.commands[2] == COMMANDS_RANGE_THETA[1]
    cb(80)  # p -> clock factor +0.1, commands reset
    assert abs(host.phase_frequency_factor - 1.1) < 1e-12
    assert host.commands[2] == 0.0
    cb(59)  # m -> clock factor back down
    assert abs(host.phase_frequency_factor - 1.0) < 1e-12
    # head mode: arrows drive head slots, locomotion zeroed
    cb(72)  # h toggles
    cb(265)
    assert host.commands[4] == NECK_PITCH_RANGE[1]
    assert host.commands[0] == 0.0
    cb(72)  # back to locomotion mode
    cb(264)
    assert host.commands[0] == COMMANDS_RANGE_X[0]


class _FakeStick:
    def __init__(self, axes, name):
        self._axes = axes
        self._name = name

    def init(self):
        pass

    def get_name(self):
        return self._name

    def get_axis(self, i):
        return self._axes[i]


class _FakePygame:
    def __init__(self, sticks):
        self._sticks = sticks

        class _J:
            @staticmethod
            def init():
                pass

            @staticmethod
            def get_count():
                return len(sticks)

            @staticmethod
            def Joystick(i):
                return sticks[i]

        self.joystick = _J

        class _E:
            @staticmethod
            def pump():
                pass

        self.event = _E

    def init(self):
        pass


def test_pygame_joystick_mapping():
    # stick1 pushed forward (axis1 = -1) and right (axis0 = +0.5),
    # stick2 axis0 = -1 -> full positive turn
    sticks = [_FakeStick([0.5, -1.0], "s1"), _FakeStick([-1.0, 0.0], "s2")]
    cmd = [9.9, 9.9, 9.9]
    tele = PygameJoystickTeleop(cmd, pygame_module=_FakePygame(sticks))
    assert cmd[:3] == [0.0, 0.0, 0.0]  # init zeroes the command
    tele.poll()
    assert abs(cmd[0] - COMMANDS_RANGE_X[1]) < 1e-12          # forward = +vx max
    assert abs(cmd[1] - (-0.5 * COMMANDS_RANGE_Y[1])) < 1e-12  # right = -vy
    assert abs(cmd[2] - COMMANDS_RANGE_THETA[1]) < 1e-12      # stick2 -> +wz
    # reverse: axis1 = +1 uses the asymmetric negative range
    sticks[0]._axes = [0.0, 1.0]
    tele.poll()
    assert abs(cmd[0] - (-abs(COMMANDS_RANGE_X[0]))) < 1e-12


def test_pygame_no_joystick_is_noop():
    cmd = [0.1, 0.2, 0.3]
    tele = PygameJoystickTeleop(cmd, pygame_module=_FakePygame([]))
    tele.poll()
    assert cmd == [0.1, 0.2, 0.3]


class _FakeViewer:
    def __init__(self, ticks):
        self._left = ticks
        self.synced = 0
        self.key_callback = None

    def is_running(self):
        self._left -= 1
        return self._left >= 0

    def sync(self):
        self.synced += 1

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_run_viewer_loop(tmp_path):
    host = _Host()
    viewer = _FakeViewer(ticks=5)

    def launch(model, data, key_callback=None):
        viewer.key_callback = key_callback
        return viewer

    out = str(tmp_path / "obs.pkl")
    obs = run_viewer(host, save_path=out, launch=launch)
    assert host.stepped == 5 and viewer.synced == 5
    assert len(obs) == 5
    import pickle

    with open(out, "rb") as f:
        assert len(pickle.load(f)) == 5
    # the installed key callback drives the host's commands
    viewer.key_callback(265)
    assert host.commands[0] == COMMANDS_RANGE_X[1]


def test_live_gait_view_headless():
    from open_duck_playground_tpu.deploy.ref_motion_viewer import live_view

    viewer = _FakeViewer(ticks=4)

    def launch(model, data, key_callback=None):
        return viewer

    sticks = [_FakeStick([0.0, -1.0], "s1")]
    ticks = live_view(command=(0.05, 0.0, 0.0), joystick=True, launch=launch,
                      pygame_module=_FakePygame(sticks), max_seconds=10.0)
    assert ticks == 4 and viewer.synced == 4
