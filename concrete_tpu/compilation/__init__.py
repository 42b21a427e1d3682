from concrete_tpu.compilation.configuration import Configuration
from concrete_tpu.compilation.compiler import Compiler, compiler
from concrete_tpu.compilation.circuit import Circuit
from concrete_tpu.compilation.keys import Keys
from concrete_tpu.compilation.client import Client
from concrete_tpu.compilation.server import Server
from concrete_tpu.compilation.module import (FheFunction, FheModule,
                                              ModuleCompiler, function,
                                              module)

__all__ = ["Configuration", "Compiler", "compiler", "Circuit", "Keys",
           "Client", "Server", "FheModule", "FheFunction", "ModuleCompiler",
           "function", "module"]
