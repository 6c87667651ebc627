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
_V2 = os.path.join(_LOCAL, "handposedd_synth_v2.cnnb")
DEFAULT_CNNB = _V2 if os.path.exists(_V2) \
    else os.path.join(_LOCAL, "handposedd_synth.cnnb")
