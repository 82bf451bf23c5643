from .rays import Rays, generate_rays, namedtuple_map
from .procedural import Procedural360Scene, ProceduralDynamicScene, ProceduralScene

__all__ = ["Rays", "generate_rays", "namedtuple_map", "ProceduralScene", "ProceduralDynamicScene", "Procedural360Scene"]
