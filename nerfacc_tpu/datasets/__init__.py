from .rays import Rays, generate_rays, namedtuple_map
from .procedural import ProceduralDynamicScene, ProceduralScene

__all__ = ["Rays", "generate_rays", "namedtuple_map", "ProceduralScene", "ProceduralDynamicScene"]
