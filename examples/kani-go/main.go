// Go embedding demo — parity with the reference's kani-go wrapper
// (kani-go/main.go): cgo-link libkani_native.so and call the
// run_kanirenderer C ABI.
//
// Build (requires a Go toolchain; not present in the CI image):
//   make -C ../../native
//   CGO_LDFLAGS="-L../../native -lkani_native" go build .
package main

/*
#cgo CFLAGS: -I../../include
#cgo LDFLAGS: -L../../native -lkani_native
#include "kanirenderer_tpu.h"
#include <stdlib.h>
*/
import "C"

import (
	"flag"
	"unsafe"
)

func main() {
	path := flag.String("path", "", "OBJ file path (empty = default cube)")
	ftype := flag.String("type", "opengl", "opengl|default")
	mode := flag.String("mode", "windowed", "windowed|fullscreen")
	hdr := flag.Bool("hdr", false, "HDR surface")
	flag.Parse()

	cPath := C.CString(*path)
	cType := C.CString(*ftype)
	cMode := C.CString(*mode)
	defer C.free(unsafe.Pointer(cPath))
	defer C.free(unsafe.Pointer(cType))
	defer C.free(unsafe.Pointer(cMode))

	h := C.int(0)
	if *hdr {
		h = 1
	}
	C.run_kanirenderer(cPath, cType, cMode, h)
}
