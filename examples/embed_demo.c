/* C embedding demo — the counterpart of the reference's kani-go wrapper
 * (kani-go/main.go): link libkani_native.so and drive the renderer through
 * the run_kanirenderer C ABI.
 *
 * Build:
 *   make -C ../native
 *   gcc embed_demo.c -o embed_demo -I../include -L../native -lkani_native \
 *       -Wl,-rpath,$PWD/../native
 * Run:
 *   ./embed_demo [file.obj] [opengl|default] [windowed|fullscreen] [hdr]
 */
#include <stdio.h>
#include <string.h>

#include "kanirenderer_tpu.h"

int main(int argc, char** argv) {
    const char* path = argc > 1 ? argv[1] : "";
    const char* type = argc > 2 ? argv[2] : "opengl";
    const char* mode = argc > 3 ? argv[3] : "windowed";
    int hdr = argc > 4 && strcmp(argv[4], "hdr") == 0;

    printf("embedding kanirenderer_tpu: path='%s' type=%s mode=%s hdr=%d\n",
           path, type, mode, hdr);
    return run_kanirenderer(path, type, mode, hdr);
}
