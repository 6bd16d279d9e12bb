"""Interactive-input translation tests (runtime/input.py) — headless:
EventAccumulator is pure logic fed with synthetic tk-style events."""

import itertools

from kanirenderer_tpu.runtime.input import TK_KEYMAP, EventAccumulator
from kanirenderer_tpu.runtime.loop import Events, PRESENT_MODES, run_loop
from kanirenderer_tpu.models.procedural import cube_scene
from kanirenderer_tpu.core.types import RenderConfig, RenderMode


def test_key_press_hold_release():
    acc = EventAccumulator()
    acc.key_press("w")
    acc.key_press("Shift_L")
    ev = acc.poll()
    assert ev.held == frozenset({"w", "lshift"})
    assert ev.pressed == frozenset({"w", "lshift"})
    # still held next frame, but no longer "newly pressed"
    ev = acc.poll()
    assert ev.held == frozenset({"w", "lshift"})
    assert ev.pressed == frozenset()
    acc.key_release("w")
    ev = acc.poll()
    assert ev.held == frozenset({"lshift"})


def test_autorepeat_does_not_retrigger_pressed():
    acc = EventAccumulator()
    acc.key_press("Tab")
    ev = acc.poll()
    assert "tab" in ev.pressed
    # X11 auto-repeat: release+press pairs while physically held
    acc.key_release("Tab")
    acc.key_press("Tab")
    ev = acc.poll()
    assert "tab" in ev.held
    assert "tab" not in ev.pressed  # would re-cycle the render mode


def test_mouse_look_and_deltas():
    acc = EventAccumulator()
    acc.mouse_move(100, 100)
    acc.button_press(3, 100, 100)  # RMB -> look
    acc.mouse_move(110, 95)
    ev = acc.poll()
    assert ev.mouse_look
    assert ev.mouse_dx == 10 and ev.mouse_dy == -5
    acc.button_release(3)
    ev = acc.poll()
    assert not ev.mouse_look
    assert ev.mouse_dx == 0  # deltas drained


def test_raw_move_grab_deltas():
    """Pointer-warp mouse-look (reference raw DeviceEvent::MouseMotion,
    src/lib.rs:2092-2102): raw deltas accumulate independently of absolute
    position, and reset_pointer prevents a post-grab warp jump."""
    acc = EventAccumulator()
    acc.mouse_move(100, 100)
    acc.button_press(3, 100, 100)
    acc.raw_move(7, -3)        # warped deltas while grabbed
    acc.raw_move(5, 2)
    ev = acc.poll()
    assert ev.mouse_look
    assert ev.mouse_dx == 12 and ev.mouse_dy == -1
    acc.button_release(3)
    acc.reset_pointer()        # grab ended; pointer was warped to center
    acc.mouse_move(320, 240)   # first absolute fix: no delta
    ev = acc.poll()
    assert ev.mouse_dx == 0 and ev.mouse_dy == 0


def test_click_scroll_resize_quit():
    acc = EventAccumulator()
    acc.button_press(1, 42, 17)     # LMB -> depth pick
    acc.button_press(4, 0, 0)       # X11 wheel up
    acc.wheel(-240)                 # Windows wheel down 2 notches
    acc.configure(800, 600)
    ev = acc.poll()
    assert ev.click_pos == (42, 17)
    assert ev.scroll == -1.0        # +1 - 2
    assert ev.resize == (800, 600)
    assert not ev.quit
    acc.close()
    assert acc.poll().quit


def test_escape_quits():
    acc = EventAccumulator()
    acc.key_press("Escape")
    assert acc.poll().quit


def test_keymap_covers_reference_bindings():
    # every reference binding (src/lib.rs:1208-1379, camera.rs, light.rs)
    needed = {"w", "a", "s", "d", "up", "down", "left", "right", "space",
              "lshift", "tab", "f1", "f11", "1", "2", "3", "r", "t", "y",
              "i", "j", "k", "l", "u", "o", "=", "-", "[", "]"}
    assert needed <= set(TK_KEYMAP.values())


class _FullscreenSink:
    def __init__(self):
        self.calls = []

    def present(self, frame):
        pass

    def close(self):
        pass

    def set_fullscreen(self, fs):
        self.calls.append(fs)


def test_f11_drives_sink_and_f1_cycles_present_mode():
    scene = cube_scene()
    sink = _FullscreenSink()
    events = iter([
        Events(pressed=frozenset({"f11", "f1"})),
        Events(pressed=frozenset({"f11"})),
        Events(quit=True),
    ])
    cfg = RenderConfig(width=64, height=64, mode=RenderMode.UNLIT,
                       shadow_dim=64, raster_backend="xla")
    stats = run_loop(scene, events, config=cfg, sink=sink)
    assert sink.calls == [True, False]
    assert stats["present_mode"] == PRESENT_MODES[1]
    assert stats["frames"] == 2
