/* Stub for the reference's missing misccose.c (included at SMC.h:20).
 *
 * The file is absent from the upstream snapshot; by usage it must provide
 * make_directory (main.c:55,59), currentTime (main.c:64, SMC.c:122) and
 * new_strtof (main.c:18). These minimal implementations restore
 * compilation — original code, not copied from anywhere.
 */
#pragma once
#include <sys/stat.h>
#include <sys/types.h>
#include <time.h>
#include <stdlib.h>

static void make_directory(const char *name) { mkdir(name, 0755); }

static int *currentTime(void) {
    static int hm[2];
    time_t t = time(NULL);
    struct tm *lt = localtime(&t);
    hm[0] = lt->tm_hour;
    hm[1] = lt->tm_min;
    return hm;
}

static double new_strtof(const char *s, char **end, int base) {
    (void)base;
    return strtod(s, end);
}
