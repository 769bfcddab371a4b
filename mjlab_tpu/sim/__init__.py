from mjlab_tpu.sim.sim import MujocoCfg, Simulation, SimulationCfg

__all__ = ["MujocoCfg", "Simulation", "SimulationCfg"]
