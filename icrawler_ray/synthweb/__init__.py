from icrawler_ray.synthweb.fetchstub import StubResponse, StubSession  # noqa: F401
from icrawler_ray.synthweb.generate import SynthWeb, make_synthweb  # noqa: F401
