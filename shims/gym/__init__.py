"""Minimal vendored `gym` shim — just enough API for the REFERENCE env
package (`/root/reference/envs/gym-track2d/`) to import and run, so the
cross-validation harness (run/parity.py cross_check) can drive the actual
reference `Track1v1Env` in this image (which has no gym installed).

Surface used by the reference (verified by grep):
  - `gym.Env` base class             (track_1v1.py:11)
  - `gym.spaces.Discrete/Box`        (track_1v1.py:249,255-259)
  - `gym.utils.seeding.np_random`    (track_1v1.py:130)
  - `gym.envs.registration.register` (gym_track2d/__init__.py:1)
  - `gym.make(id)` + TimeLimit(500)  (gym_track2d/__init__.py:17)
  - `Discrete.n`                     (navigator.py:7,75)

This is a clean-room stub of the long-public gym API written for testing
only; it is inserted into sys.path exclusively by the parity harness and the
cross-validation test.
"""

from gym import spaces  # noqa: F401  (submodule, imported for side effect)
from gym.core import Env, Wrapper
from gym.envs.registration import make, register, registry

__all__ = ["Env", "Wrapper", "make", "register", "registry", "spaces"]
__version__ = "0.0.shim"
