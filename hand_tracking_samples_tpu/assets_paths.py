"""Default asset locations: repo-vendored, falling back to the reference
mount if the local copies are missing."""
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LOCAL = os.path.join(_REPO, "assets")
_REF = "/root/reference/assets"


def _find(name: str) -> str:
    p = os.path.join(_LOCAL, name)
    if os.path.exists(p):
        return p
    return os.path.join(_REF, name)


DEFAULT_MODEL_JSON = _find("model_hand.json")
DEFAULT_ANIMBANK = _find("animbank.pose")
DEFAULT_VANITY_BONES = _find("vanity_bones.json")
# Best shipped net by cold-start eval (tools/eval_coldstart.py, 64 starts x
# 64 frames): v4 10.35mm mean / 4.9mm median / 61% <8mm; v3 10.43; v2 10.65
# (the residual mean is stuck-track dominated, net-independent).
_PREFERRED = ("handposedd_synth_v4.cnnb", "handposedd_synth_v3.cnnb",
              "handposedd_synth_v2.cnnb", "handposedd_synth.cnnb")
DEFAULT_CNNB = os.environ.get("HTS_CNNB") or next(
    (os.path.join(_LOCAL, n) for n in _PREFERRED
     if os.path.exists(os.path.join(_LOCAL, n))),
    os.path.join(_LOCAL, "handposedd_synth.cnnb"))
